package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler for encode-path primitives (not part of the
  * engine surface; used to attribute bench time).
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val input = args.headOption.getOrElse("/tmp/graft-bench/input-_root_testdata_sf0.1-r20")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(input)

    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
    }

    t("count")(df.count())
    t("count2")(df.count())
    t("sum_n_tok")(df.agg(sum("n_tok")).head())
    t("explode_count")(df.select(explode(col("tokens")).as("t")).count())
    t("explode_hll")(df.select(explode(col("tokens")).as("t"))
      .agg(approx_count_distinct(col("t"), 0.01)).head())
    t("explode_hll2")(df.select(explode(col("tokens")).as("t"))
      .agg(approx_count_distinct(col("t"), 0.05)).head())
    t("xxhash_xor")(df.agg(expr("bit_xor(xxhash64(doc_id, tokens, n_tok, source))")).head())
    t("array_minmax")(df.agg(min(array_min(col("tokens"))), max(array_max(col("tokens")))).head())
    t("quantile")(df.select(expr("try_cast(doc_id as bigint)").as("k"))
      .stat.approxQuantile("k", Array(0.25, 0.5, 0.75), 0.001).mkString(","))
    t("encode_only")(df.select(
      graft.functions.graft_encode(col("tokens")).as("p"))
      .agg(sum(octet_length(col("p")))).head())
    t("encode_bitpack_only")(df.select(
      graft.functions.graft_encode(col("tokens"), "bitpack").as("p"))
      .agg(sum(octet_length(col("p")))).head())

    // staged block pipeline (mirrors GraftTable.encode internals)
    val keyed = df.select(col("doc_id"), col("tokens"), col("n_tok"), col("source"),
      expr("coalesce(try_cast(doc_id as bigint), xxhash64(doc_id))").as("_graft_key"))
      .withColumn("block_id", pmod(col("_graft_key"), lit(123L)).cast("int"))
    val rsSorted = array_sort(
      collect_list(struct(col("_graft_key").as("k"), col("doc_id"), col("tokens"),
        col("n_tok"), col("source"))),
      (l, r) => when(l("k") < r("k"), -1).when(l("k") > r("k"), 1).otherwise(0))
    val rsPlain = collect_list(struct(col("_graft_key").as("k"), col("doc_id"),
      col("tokens"), col("n_tok"), col("source")))

    def all4(base: org.apache.spark.sql.DataFrame) = base
      .groupBy("block_id").agg(rsSorted.as("rs"))
      .select(
        (octet_length(graft.functions.graft_encode_str(transform(col("rs"), r => r("doc_id")))) +
          octet_length(graft.functions.graft_encode(flatten(transform(col("rs"), r => r("tokens"))))) +
          octet_length(graft.functions.graft_encode(transform(col("rs"), r => r("n_tok")))) +
          octet_length(graft.functions.graft_encode_str(transform(col("rs"), r => r("source"))))).as("n"))
      .agg(sum(col("n")))

    t("all4_plain")(all4(keyed).head())
    t("all4_repart64")(all4(keyed.repartition(64, col("block_id"))).head())
    t("all4_repart32")(all4(keyed.repartition(32, col("block_id"))).head())
    t("all4_noaqe") {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val r = all4(keyed).head()
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      r
    }
    t("all4_repart64_again")(all4(keyed.repartition(64, col("block_id"))).head())

    import graft.table.GraftTable
    val fs = new org.apache.hadoop.fs.Path("/tmp/graft-bench")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(1, 2, 3).foreach { i =>
      fs.delete(new org.apache.hadoop.fs.Path(s"/tmp/graft-bench/probe-table-$i"), true)
      t(s"real_encode_$i")(GraftTable.encode(df, s"/tmp/graft-bench/probe-table-$i",
        GraftTable.Options(targetRowsPerBlock = 8192)).blocksEncodedThisRun)
    }
    spark.stop()
  }
}
