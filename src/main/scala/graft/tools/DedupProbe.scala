package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Round-6 measurement harness for the dedup/near-dup family (guide §1:
  * measure first, noop-style — results are counted, never written).
  * Each operator runs `runs` times with fresh lineage; min is reported.
  *
  * Usage: runMain graft.tools.DedupProbe [sfDir] [runs]
  */
object DedupProbe {
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
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def timed(tag: String)(f: => Long): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        Dedup.releaseCaches()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$tag%-26s min=${times.map(_._1).min}%6.2fs rows=${times.head._2} " +
        s"all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    spark.sparkContext.setJobDescription("probe: clusters")
    timed("clusters(jaccard)")(
      Dedup.clusters(Dedup.jaccardPairs(docs, 0.9), docs).count())
    spark.sparkContext.setJobDescription("probe: jaccardPairs")
    timed("jaccardPairs")(Dedup.jaccardPairs(docs, 0.9).count())
    spark.sparkContext.setJobDescription("probe: minHashLsh")
    timed("minHashLsh")(Dedup.minHashLsh(docs, threshold = 0.9).count())
    spark.sparkContext.setJobDescription("probe: embeddingNearDup")
    timed("embeddingNearDup")(
      Dedup.embeddingNearDup(emb, 0.46, bands = 16, rowsPerBand = 2).count())
    spark.sparkContext.setJobDescription("probe: simHash")
    timed("simHash")(Dedup.simHash(
      docs.select(col("doc_id").cast("string").as("doc_id"), col("text")),
      maxHamming = 0).count())
    spark.stop()
  }
}
