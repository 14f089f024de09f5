package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Phase attribution for q_dedup_clusters at bench scale: how many
  * near-dup edges exist, how long the pair computation takes alone, and
  * how long the propagation rounds + assembly add on top.
  *
  * Usage: runMain graft.tools.ClusterPhaseProbe [sfDir]
  */
object ClusterPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"docs: ${docs.count()}")
    for (round <- 1 to 2) {
      println(s"--- round $round (caches ${if (round == 1) "cold" else "warm"})")
      val pairs = Dedup.jaccardPairs(docs, threshold = 0.9)
      val nPairs = time("pairs.count")(pairs.count())
      println(s"pairs: $nPairs")
      val n = time("clusters.count")(Dedup.clusters(pairs, docs).count())
      println(s"cluster rows: $n")
    }
    Dedup.releaseCaches()
    spark.stop()
  }
}
