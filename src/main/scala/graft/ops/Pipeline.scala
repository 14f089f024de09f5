package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.{GraftTable, Tokenize}

/** The composed training-data pipeline: quality filter → exact dedup →
  * near-dup removal (MinHash-LSH) → tokenize → encoded-table commit.
  * Each stage is one of the engine's tested operators; this wires them in
  * the order a pretraining ingest actually runs them, with per-stage counts
  * reported for lineage.
  *
  * Scale shape: the quality filter and tokenize are map-only; exact dedup
  * shuffles 32-byte digests; LSH shuffles band buckets (linear); the
  * near-dup kill removal is a planner-chosen anti join (AQE broadcasts it
  * when the list fits, shuffles when it doesn't); encode is the table's
  * single data shuffle.
  */
object Pipeline {

  final case class Report(
      input: Long,
      afterQuality: Long,
      afterExactDedup: Long,
      afterNearDedup: Long,
      encode: GraftTable.EncodeResult)

  def cleanAndEncode(
      docs: DataFrame,
      tableDir: String,
      minWords: Int = 10,
      nearDupThreshold: Double = 0.9,
      transitiveNearDup: Boolean = false,
      opts: GraftTable.Options = GraftTable.Options()): Report = {
    val spark = docs.sparkSession
    val input = docs.count()

    // 1. quality gate
    val q = TextAnalysis.quality(docs).where(col("quality_ok"))
      .select(col("doc_id"))
    val kept1 = docs.join(q, docs("doc_id").cast("string") === q("doc_id"), "left_semi")
    val afterQuality = kept1.count()

    // 2. exact dedup: keep rank 1 of each digest group
    val keep2 = Dedup.exact(kept1.select(col("doc_id").cast("string").as("doc_id"), col("text")))
      .where(!col("is_dup")).select(col("doc_id"))
    val kept2 = kept1.join(keep2,
      kept1("doc_id").cast("string") === keep2("doc_id"), "left_semi")
    val afterExact = kept2.count()

    // 3. near-dup removal: drop the higher doc_id of each verified pair.
    // NO broadcast hint on the kill list: it is bounded by the number of
    // detected near-dup documents, which at a realistic 5–20% dup rate on
    // a 10^12-row corpus is billions of ids — a forced broadcast OOMs the
    // driver (VERDICT r2). Left to the planner, AQE broadcasts when the
    // list actually fits and falls back to a shuffled anti join when not.
    // Two policies: pairwise (default) drops the larger id of each
    // verified pair — keeps every doc not directly paired with a smaller
    // one, so two docs that are both near-dups of a THIRD but not of each
    // other BOTH survive. transitiveNearDup=true closes the pairs into
    // connected components (Dedup.clusters) and keeps exactly ONE
    // canonical doc per component — the aggressive-cleaning policy.
    val pairs = Dedup.minHashLsh(kept2, threshold = nearDupThreshold)
    val kill =
      if (transitiveNearDup)
        Dedup.clusters(pairs,
          kept2.select(col("doc_id").cast("string").as("doc_id")))
          .where(!col("is_canonical")).select(col("doc_id"))
      else pairs.select(col("doc_b").as("doc_id")).distinct()
    val kept3 = kept2.join(kill,
      kept2("doc_id").cast("string") === kill("doc_id"), "left_anti")
    val afterNear = kept3.count()

    // 4. tokenize + encode (vocab discovered from the CLEANED corpus)
    // The encode is the LAST consumer of the near-dup kill list's lineage,
    // so the shingle caches Dedup persisted release right after it — a
    // pipeline invoked repeatedly in one session must not accumulate
    // MEMORY_AND_DISK blocks (see Dedup.releaseCaches).
    try {
      val tokens = Tokenize.tokenTable(kept3, Tokenize.vocab(kept3)).toDF()
      val res = GraftTable.encode(tokens, tableDir, opts)
      Report(input, afterQuality, afterExact, afterNear, res)
    } finally Dedup.releaseCaches()
  }
}
