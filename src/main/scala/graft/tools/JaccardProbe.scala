package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Phase attribution for the exact PPJoin-style Jaccard join — "where do
  * the seconds go" on a real documents table. Mirrors the stages of
  * [[Dedup.jaccardPairs]] (shingle+order build, prefix candidates, full
  * pipeline) so a slow bench reading can be localized to a stage instead
  * of guessed at.
  *
  * Usage: runMain graft.tools.JaccardProbe [sfDir] [runs]
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count() // pin the input out of the measurement

    def timed(tag: String)(f: => Long): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = times.map(_._1).min
      println(f"$tag%-28s best=$best%6.2fs rows=${times.head._2} " +
        s"all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    // full pipeline, fresh lineage per run (what the bench measures)
    timed("full jaccardPairs")(Dedup.jaccardPairs(docs, 0.9).count())
    // without the prefix-bucket cap (isolates the cap's two extra stages)
    timed("full, cap disabled")(
      Dedup.jaccardPairs(docs, 0.9, maxPrefixBucket = Int.MaxValue).count())
    spark.stop()
  }
}
