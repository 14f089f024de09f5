package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.{GenericTable, GraftTable}

/** Decode-route comparison for deeply nested columns: the Scala-API
  * restore rebuilds nested arrays with HOF folds, which Spark evaluates
  * WITHOUT common-subexpression elimination — at depth >= 3 the inner
  * fold re-evaluates once per outer element, so per-row cost can grow
  * super-linearly in nest size. The DSv2 connector assembles the same
  * rows imperatively (linear). This probe measures both on a depth-3
  * table (rows x 20 x 10 x 5 ints) so the trade is RECORDED, not guessed.
  *
  * Usage: runMain graft.tools.DeepNestProbe [rows]
  */
object DeepNestProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.sql(s"""
      SELECT id, transform(sequence(1, 20), a ->
               transform(sequence(1, 10), b ->
                 transform(sequence(1, 5), c -> CAST(a*100 + b*10 + c AS INT))))
             AS a3
      FROM range(0, $rows)""")
    val dir = java.nio.file.Files.createTempDirectory("deep-perf").toString
    GenericTable.encode(df, dir, keyCol = "id",
      opts = GraftTable.Options(targetRowsPerBlock = 512))
    def t(tag: String)(f: => Long): Unit = {
      val r = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$tag%-12s min=${r.map(_._1).min}%6.2fs sum=${r.head._2}")
    }
    val digest = "aggregate(flatten(flatten(a3)), 0L, (s, x) -> s + x)"
    t("scala-decode")(GenericTable.decode(spark, dir)
      .agg(sum(expr(digest))).head().getLong(0))
    t("dsv2-decode")(spark.read.format("graft").load(dir)
      .agg(sum(expr(digest))).head().getLong(0))
    spark.stop()
  }
}
