package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` of named SparkEntry queries to
  * <outDir>/<query>_<tag>.txt — the before/after plan evidence for the
  * optimization rounds. Queries run against scratch tables exactly as the
  * bench builds them (the dump itself triggers the builds).
  *
  * Usage: runMain graft.tools.QueryPlanDump <outDir> <tag> [sfDir] [q1,q2,...]
  */
object QueryPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val names = args.lift(3).map(_.split(",").toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))

    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"), txt.getBytes("UTF-8"))
      println(s"dumped $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
