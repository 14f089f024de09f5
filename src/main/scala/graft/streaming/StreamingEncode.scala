package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.table.GraftTable

/** Structured Streaming ingest into the encoded table: each micro-batch is
  * appended as its own set of blocks via [[GraftTable.append]] inside
  * `foreachBatch`, so the batch and streaming paths share one encode
  * implementation and one table format. Exactly-once at the table level
  * comes from the combination of Spark's checkpointed batch ids and the
  * append path's snapshot commit (a crashed batch leaves an orphan data dir
  * that the next attempt overwrites — versions only become visible via the
  * snapshot pointer).
  *
  * The reference had no streaming surface (batch MapReduce only); this is
  * the Spark-native extension: the same `doc_id/tokens/n_tok/source` rows
  * arriving as a stream (file source, Kafka, rate…) land in the same
  * Iceberg-shaped table that [[GraftTable.decode]] reads.
  */
object StreamingEncode {

  def start(
      stream: DataFrame,
      tableDir: String,
      checkpointDir: String,
      opts: GraftTable.Options = GraftTable.Options(),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { GraftTable.append(batch, tableDir, opts); () }
      }
      .start()
}
