package graft.table

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's input row (BASELINE.json:15): a pre-tokenized training
  * sequence. `tokens` is non-null `array<int32>`.
  */
final case class TokenRow(doc_id: String, tokens: Array[Int], n_tok: Int, source: String)

/** Deterministic synthesis of the token table from the driver-provided
  * documents table (FIXTURES.md §2). Pure function of the data: vocab =
  * sorted distinct words (discovered, not hardcoded), token id = index in
  * vocab. No clocks, no RNG.
  *
  * Scale notes: vocab discovery is a distinct+sort over words (bounded
  * alphabet — tokenizer vocabs are ≤ a few 100k entries), collected once
  * and shipped as a literal map, so the per-token lookup is a codegen'd
  * hash probe with no join or shuffle on the 100 TB side.
  */
object Tokenize {

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Sorted distinct words across the corpus. */
  def vocab(docs: DataFrame): Array[String] =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .distinct()
      .orderBy("word")
      .collect()
      .map(_.getString(0))

  def tokenTable(docs: DataFrame, vocab: Array[String]): Dataset[TokenRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vmap = typedLit(vocab.zipWithIndex.toMap)
    docs.select(
        col("doc_id").cast("string").as("doc_id"),
        transform(split(col("text"), " "), w => element_at(vmap, w)).as("tokens"),
        col("source"))
      .withColumn("n_tok", size(col("tokens")))
      .select("doc_id", "tokens", "n_tok", "source")
      .as[TokenRow]
  }

  def tokenTable(spark: SparkSession, sfDir: String): Dataset[TokenRow] = {
    val docs = documents(spark, sfDir)
    tokenTable(docs, vocab(docs))
  }

  /** Per-doc positional checksum used by the oracle queries: weighted sum
    * `Σ token_i * (i+1)` — overflow-free (DuckDB errors on BIGINT overflow,
    * so no wrap-around hashes) yet position-sensitive.
    */
  def checksumCol(tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      transform(tokens, (t, i) => t.cast("long") * (i.cast("long") + 1L)),
      lit(0L),
      (acc, x) => acc + x)
}
