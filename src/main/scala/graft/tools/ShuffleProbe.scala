package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions._

/** Measures the encode exchange's shuffle-write bytes with and without
  * map-side FOR packing of the tokens column (evidence for the packing
  * rationale in GraftTable).
  *
  * Usage: runMain graft.tools.ShuffleProbe [inputParquetDir]
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val input = args.headOption.getOrElse(
      "/tmp/graft-bench/input-_root_testdata_sf0.1-r1000")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val written = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          written.add(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val keyed = spark.read.parquet(input).select(
      col("doc_id"), col("tokens"), col("n_tok"), col("source"),
      expr("coalesce(try_cast(doc_id as bigint), xxhash64(doc_id))").as("_graft_key"))
    val bounds = spark.sparkContext.broadcast((1L to 610L).map(_ * 8192).toArray)

    // the consuming aggregate runs AFTER the explicit repartition, so the
    // tokens column must cross the exchange (a count-only probe lets
    // Catalyst prune tokens out and measures nothing)
    def measure(tag: String, tokensCol: org.apache.spark.sql.Column,
        sizeOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
      written.reset()
      keyed.select(
          graft_range_bucket(col("_graft_key"), bounds).as("block_id"),
          col("_graft_key").as("k"), col("doc_id"),
          tokensCol.as("tokens"), col("n_tok"), col("source"))
        .repartition(16, col("block_id"))
        .sortWithinPartitions(col("block_id"), col("k"), col("doc_id"))
        .agg(sum(sizeOf(col("tokens"))), sum(length(col("doc_id"))))
        .collect()
      Thread.sleep(1500) // let the listener bus drain the final task events
      println(f"SHUFFLE $tag bytesWritten=${written.sum()}%,d")
    }
    measure("raw-int-arrays", col("tokens"), c => size(c).cast("long"))
    measure("for-packed", graft_encode(col("tokens"), "for"), c => octet_length(c).cast("long"))
    spark.stop()
  }
}
