package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-equivalent timing for the q_dedup_clusters / q_dedup_jaccard
  * pair: same query functions, same .count() action, same cache-sharing
  * (no releaseCaches between calls) and the same alphabetical order the
  * bench uses. Prints first/steady per query.
  *
  * Usage: runMain graft.tools.ClusterBenchProbe [sfDir]
  */
object ClusterBenchProbe {
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

    for (name <- Seq("q_dedup_clusters", "q_dedup_jaccard", "q_dedup_minhash")) {
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val first = once()
      val steady = once()
      println(f"$name%-22s first=$first%6.2fs steady=$steady%6.2fs")
    }
    spark.stop()
  }
}
