package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Stage attribution for embeddingNearDup — times each prefix of the
  * pipeline (guide §1: find WHERE the seconds go before changing code).
  *
  * Usage: runMain graft.tools.EmbedStageProbe [sfDir] [runs]
  */
object EmbedStageProbe {
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

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bands = 16
    val rpb = 2

    def timed(tag: String)(f: => Long): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$tag%-28s min=${times.map(_._1).min}%6.2fs rows=${times.head._2} " +
        s"all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    val base = emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    def banded = base.select(
        col("vec_id"),
        posexplode(Similarity.hyperplaneBandKeys(col("embedding"), bands, rpb)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    timed("scan")(base.count())
    timed("banded explode")(banded.count())
    timed("bucket sizes agg")(
      banded.groupBy("band", "bucket").agg(count(lit(1)).as("bsize")).count())
    val small = banded.groupBy("band", "bucket").agg(count(lit(1)).as("bsize"))
      .where(col("bsize") <= 4096).select("band", "bucket")
    def capped = banded.join(small, Seq("band", "bucket"), "left_semi")
    timed("capped semi")(capped.count())
    val a = capped.alias("a"); val b = capped.alias("b")
    def cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    timed("self-join")(cand.count())
    timed("+dropDup")(cand.dropDuplicates("vec_a", "vec_b").count())
    timed("full op (fresh)")(  {
      val n = Dedup.embeddingNearDup(emb, 0.46, bands, rpb).count()
      Dedup.releaseCaches(); n
    })
    timed("full op (cached bands)")(Dedup.embeddingNearDup(emb, 0.46, bands, rpb).count())
    spark.stop()
  }
}
