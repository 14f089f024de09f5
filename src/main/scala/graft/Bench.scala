package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.{GraftTable, Tokenize}

/** Driver-contract benchmark: times every SparkEntry query at the given SF,
  * plus the headline metrics from BASELINE.json — encode/decode throughput
  * (tokens/sec, min of GRAFT_BENCH_RUNS timed runs after one warmup; the
  * sandbox host carries heavy external load) and compression ratio vs the
  * same table stored as Spark-default Parquet.
  *
  * Output contract: ONE JSON line on raw stdout (build.sbt forks `run`
  * with StdoutOutput so no sbt log prefix corrupts it). Query failures are
  * RECORDED (errors array + -1 seconds), never silently timed as success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true") // E15: AQE pinned on
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // each query runs twice: `first` carries one-time costs (whole-stage
    // codegen + JIT + scratch-table builds) that amortize to zero at
    // scale; `steady` is the number that extrapolates. Reporting both
    // makes a contended driver window unable to manufacture per-query
    // "regressions" out of compile noise.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val first = once()
        val steady = once()
        (name, first, steady, true)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          (name, -1.0, -1.0, false)
      }
    }
    val errors = results.filterNot(_._4).map(_._1)

    // headline: encode/decode throughput + compression on this SF's token
    // table, replicated so the timed job is compute-bound rather than
    // overhead-bound (repl=50 in round 1 measured job overhead, not the
    // engine). Compression is reported against the same table's
    // Spark-default Parquet footprint.
    val fs = new Path("/tmp/graft-bench").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val base = Tokenize.tokenTable(spark, sfDir).toDF()

    val repl = sys.env.getOrElse("GRAFT_BENCH_REPL", "1000").toInt
    val big =
      if (repl <= 1) base
      else base
        .withColumn("rep", explode(sequence(lit(0), lit(repl - 1))))
        .select(
          (col("doc_id").cast("long") * repl + col("rep")).cast("string").as("doc_id"),
          col("tokens"), col("n_tok"), col("source"))
    val bigDir = s"/tmp/graft-bench/bench-input-$sfTag-r$repl"
    if (!fs.exists(new Path(s"$bigDir/_SUCCESS")))
      big.repartition(64).write.mode("overwrite").parquet(bigDir)
    val bigRef = fs.getContentSummary(new Path(bigDir)).getLength
    val input = spark.read.parquet(bigDir)

    // min-of-4 by default: the sandbox host idles at loadavg 12-20 from
    // other tenants and identical runs swing 3-13x — two samples are not
    // enough for the min to survive a contended window
    val runs = sys.env.getOrElse("GRAFT_BENCH_RUNS", "4").toInt
    def encodeOnce(tag: String): (Double, GraftTable.EncodeResult, String) = {
      val dir = s"/tmp/graft-bench/bench-table-$sfTag-$tag"
      fs.delete(new Path(dir), true)
      val t0 = System.nanoTime()
      val r = GraftTable.encode(input, dir, GraftTable.Options(targetRowsPerBlock = 8192))
      ((System.nanoTime() - t0) / 1e9, r, dir)
    }
    encodeOnce("warmup")
    val timed = (1 to runs).map(i => encodeOnce(s"r$i"))
    val encSec = timed.map(_._1).min
    val enc = timed.head._2
    val tableDir = timed.head._3

    // decode throughput on the same table (sum(n_tok) forces full decode)
    val decRuns = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      GraftTable.decode(spark, tableDir).toDF().agg(sum("n_tok")).head()
      (System.nanoTime() - t0) / 1e9
    }
    val decSec = decRuns.min

    val qs = results.map { case (k, v, _, _) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val qsSteady = results.map { case (k, _, v, _) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val errsJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.filter(_._4).map(_._2).sum
    val totalSteady = results.filter(_._4).map(_._3).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
        f""""total_steady":$totalSteady%.3f,"queries_steady":$qsSteady,""" +
        f""""errors":$errsJson,"sf":"$sfDir",""" +
        f""""repl":$repl,"encode_sec":$encSec%.3f,"tokens":${enc.tokenCount},""" +
        f""""tokens_per_sec":${enc.tokenCount / encSec}%.0f,""" +
        s""""encode_all_runs_sec":${timed.map(t => f"${t._1}%.3f").mkString("[", ",", "]")},""" +
        s""""decode_all_runs_sec":${decRuns.map(t => f"$t%.3f").mkString("[", ",", "]")},""" +
        f""""decode_sec":$decSec%.3f,"decode_tokens_per_sec":${enc.tokenCount / decSec}%.0f,""" +
        s""""encoded_bytes":${enc.bytesTotal},"ref_parquet_bytes":$bigRef,""" +
        f""""compression_vs_parquet":${enc.bytesTotal.toDouble / bigRef}%.4f,""" +
        f""""compression_vs_plain":${enc.compressionVsPlain}%.4f}""")
    spark.stop()
  }
}
