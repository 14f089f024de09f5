package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the token/document stream — the Structured
  * Streaming surface beyond ingest: event-time windowed aggregation under a
  * watermark, and custom keyed state via `flatMapGroupsWithState`.
  *
  * Scale notes: per-key state stays small — the windowed agg drops state
  * once the watermark passes a window, and the stateful dedup keeps one
  * (digest, first id, count) entry per UNIQUE document, never the stream
  * length × payload.
  */
object StreamingOps {

  /** Event-time token-rate table: tokens and docs per (window, source),
    * late data beyond `watermark` dropped, emitted append-mode once the
    * watermark closes a window. Input needs (event_time: timestamp,
    * source: string, n_tok: int).
    */
  def windowedTokenCounts(
      stream: DataFrame,
      windowDuration: String = "10 seconds",
      watermark: String = "30 seconds"): DataFrame =
    stream
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDuration), col("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_tok").cast("long")).as("tokens"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("source"), col("docs"), col("tokens"))

  /** Sliding-window token rate: like [[windowedTokenCounts]] but windows
    * overlap (`slideDuration` < `windowDuration`), so each event counts in
    * windowDuration/slideDuration windows — the smoothed-rate view.
    */
  def slidingTokenCounts(
      stream: DataFrame,
      windowDuration: String = "10 seconds",
      slideDuration: String = "5 seconds",
      watermark: String = "30 seconds"): DataFrame =
    stream
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDuration, slideDuration), col("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_tok").cast("long")).as("tokens"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("source"), col("docs"), col("tokens"))

  /** Session-window activity per source: events within `gap` of each other
    * merge into one session (native `session_window` — state closes when
    * the watermark passes a session's end + gap). The ingest-burst view:
    * one row per (source, burst) with its span and volume.
    */
  def sessionizedCounts(
      stream: DataFrame,
      gap: String = "10 seconds",
      watermark: String = "30 seconds"): DataFrame =
    stream
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_tok").cast("long")).as("tokens"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("source"), col("docs"), col("tokens"))

  /** Streaming clean-and-encode: dedup the document stream by content
    * digest, tokenize survivors against a fixed broadcast vocab, and land
    * them in the graft table — the streaming analogue of
    * [[graft.ops.Pipeline.cleanAndEncode]], composed from [[dedupStream]]
    * and [[StreamingEncode]]'s idempotent batch sink.
    */
  def cleanAndEncodeStream(
      docs: DataFrame,
      vocab: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]],
      tableDir: String,
      checkpointDir: String,
      opts: graft.table.GraftTable.Options = graft.table.GraftTable.Options())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val deduped = dedupStream(docs).toDF()
    StreamingEncode.start(
      graft.table.Tokenize.tokenTable(deduped, vocab).toDF(),
      tableDir, checkpointDir, opts,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
  }

  final case class SeenDoc(digest: String, doc_id: String, text: String, source: String)
  final case class DedupState(firstDocId: String, dups: Long)

  /** Streaming exact dedup: the FIRST document with a given content digest
    * passes through; replicas in the same or any later micro-batch are
    * dropped. State per digest is (first doc id, dup count) — the
    * streaming analogue of [[graft.ops.Dedup.exact]], keyed the same way
    * (sha256 of the text). State is retained for the life of the query
    * (correct-by-definition for exact dedup: any digest may recur); bound
    * it operationally by restarting from a fresh checkpoint per corpus
    * epoch, or switch to a timeout if at-most-epoch dedup suffices.
    */
  def dedupStream(docs: DataFrame): Dataset[SeenDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        sha2(col("text"), 256).as("digest"),
        col("doc_id").cast("string").as("doc_id"),
        col("text"),
        col("source").cast("string").as("source"))
      .as[SeenDoc]
      .groupByKey(_.digest)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (digest: String, rows: Iterator[SeenDoc], state: GroupState[DedupState]) =>
          val batch = rows.toSeq.sortBy(r => (r.doc_id.length, r.doc_id))
          if (state.exists) {
            state.update(state.get.copy(dups = state.get.dups + batch.size))
            Iterator.empty
          } else if (batch.nonEmpty) {
            state.update(DedupState(batch.head.doc_id, (batch.size - 1).toLong))
            Iterator.single(batch.head)
          } else Iterator.empty
      }
  }
}
