package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Stage attribution for the PPJoin-style exact Jaccard pipeline: times
  * each prefix of jaccardPairs' plan with fresh lineage (guide §1).
  *
  * Usage: runMain graft.tools.JaccardStageProbe [sfDir] [runs]
  */
object JaccardStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val threshold = 0.9

    def timed(tag: String)(f: => Long): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$tag%-28s min=${times.map(_._1).min}%6.2fs rows=${times.head._2} " +
        s"all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    val sh = docs.select(
      col("doc_id").cast("string").as("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    timed("shingles")(sh.count())
    timed("shingles forced")(sh.select(explode(col("sh"))).count())
    val posts = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val freq = posts.groupBy("g").agg(count(lit(1)).as("cnt"))
    timed("freq agg")(freq.count())
    val ordered = posts.join(freq, "g")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("cnt"), col("g")))).as("ord"))
      .select(col("doc_id"),
        expr("transform(ord, x -> x.g)").as("sh"),
        size(col("ord")).as("sz"))
    timed("ordered build")(ordered.count())
    timed("ordered forced")(
      ordered.select(col("doc_id"), explode(col("sh"))).count())
    timed("full fresh")({ val n = Dedup.jaccardPairs(docs, threshold).count(); Dedup.releaseCaches(); n })
    spark.stop()
  }
}
