package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.{GraftTable, Tokenize}

/** SQL-route read throughput for the token-lane DSv2 connector: times
  * full-table scans through `spark.read.format("graft")` (scalar column,
  * token-array column with the native checksum expression, and a
  * residual-filtered scan). The encoded table (default Options, 64k-row
  * blocks) is reused across runs.
  *
  * This probe adjudicated the columnar-vs-row reader question (see the
  * GraftReaderFactory comment): a ColumnarBatch emit measured 12.0 M
  * tok/s vs 19.6 M for the row reader at repl=100 on an idle host, so
  * the row path stays.
  *
  * Usage: runMain graft.tools.SqlScanProbe [sfDir] [repl]
  * repl > 1 unions the token table with shifted doc_ids before encode so
  * the scan has enough data to time (default 20 at sf0.1 ≈ 27M tokens).
  */
object SqlScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repl = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"/tmp/graft-tables/sq$repl-$tag"
    val base = Tokenize.tokenTable(spark, sfDir).toDF()
    val input =
      if (repl <= 1) base
      else (0 until repl).map(r =>
        base.withColumn("doc_id", concat(col("doc_id"), lit(s"#$r"))))
        .reduce(_ unionAll _)
    GraftTable.encode(input, dir, GraftTable.Options()) // resumes if done

    def timed(what: String)(f: => Unit): Double = {
      val runs = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"$what%-26s min=$best%7.3fs runs=${runs.map(r => f"$r%.2f").mkString("[", ",", "]")}")
      best
    }

    val df = spark.read.format("graft").load(dir)
    val nTokens = df.agg(sum(col("n_tok"))).collect()(0).getLong(0)
    println(s"rows=${df.count()} tokens=$nTokens")

    val tScalar = timed("scan n_tok sum")(
      df.agg(sum(col("n_tok"))).collect())
    val tTokens = timed("scan tokens checksum")(
      df.agg(sum(Tokenize.checksumCol(col("tokens")))).collect())
    val tFiltered = timed("residual-filtered scan")(
      df.where(col("source").isin("src1", "src2"))
        .agg(count(lit(1)), sum(col("n_tok"))).collect())
    println(f"""{"tokens":$nTokens,"scan_scalar_sec":$tScalar%.3f,""" +
      f""""scan_tokens_sec":$tTokens%.3f,"tokens_per_sec":${nTokens / tTokens}%.0f,""" +
      f""""filtered_sec":$tFiltered%.3f}""")
    spark.stop()
  }
}
