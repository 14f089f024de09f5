package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
/** Phase attribution for the encode+write stage (scratch tool). */
object TrialCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val in = spark.read.parquet("/tmp/graft-bench/input-_root_testdata_sf0.1-r1000")
    def t(tag: String)(f: => Any): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"ATTR $tag run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    val keyed = in.select(col("doc_id"), col("tokens"), col("n_tok"), col("source"),
      expr("coalesce(try_cast(doc_id as bigint), xxhash64(doc_id))").as("_graft_key"))
    t("scan-only")(keyed.agg(sum(col("n_tok").cast("long"))).head())
    val bounds = spark.sparkContext.broadcast((1L to 610L).map(_ * 8192).toArray)
    val shuffled = keyed
      .select(graft_range_bucket(col("_graft_key"), bounds).as("block_id"),
        col("_graft_key").as("k"), col("doc_id"),
        graft_encode(col("tokens"), "for").as("tokens"),
        col("n_tok"), col("source"))
      .repartition(16, col("block_id"))
      .sortWithinPartitions(col("block_id"), col("k"), col("doc_id"))
      .as[graft.table.BlockInput]
    t("scan+pack+shuffle+sort")(shuffled.mapPartitions(it => Iterator(it.map(_.n_tok.toLong).sum)).reduce(_ + _))
    t("scan+pack+shuffle+sort+assemble")(
      shuffled.mapPartitions(it => graft.table.BlockAssembler.assemble(it, 1, true, true))
        .map(_.token_count).reduce(_ + _))
    spark.stop()
  }
}
