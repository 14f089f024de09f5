package graft.tools

import org.apache.spark.sql.SparkSession

/** First-call vs steady-state attribution for EVERY contract query: each
  * `SparkEntry.queries` entry runs twice (fresh DataFrame each time, same
  * cached scratch tables) and the probe prints (first, second, ratio).
  * A large ratio means the bench's per-query number is dominated by
  * whole-stage-codegen/JIT compilation — a fixed cost that amortizes to
  * zero at 100 TB — rather than by data work.
  *
  * Usage: runMain graft.tools.WarmProbe [sfDir]
  */
object WarmProbe {
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
    spark.sparkContext.setLogLevel("ERROR")

    var firstTotal = 0.0
    var steadyTotal = 0.0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val first = once()
        val steady = math.min(once(), once())
        firstTotal += first
        steadyTotal += steady
        println(f"$name%-28s first=$first%7.2fs steady=$steady%7.2fs " +
          f"ratio=${first / math.max(steady, 1e-9)}%5.1fx")
      } catch {
        case e: Throwable => println(s"$name FAILED: ${e.getMessage}")
      }
    }
    println(f"TOTAL first=$firstTotal%.1fs steady=$steadyTotal%.1fs")
    spark.stop()
  }
}
