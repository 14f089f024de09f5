package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over a
  * `documents`-shaped table. All outputs are engine-portable: counts are
  * integers, ratios are single divisions of exact integers (bit-identical
  * in any IEEE-754 engine), so every query here is DuckDB-oracle-checkable.
  */
object TextAnalysis {

  /** Tokenization-rate pattern shared with the oracle: letter runs, digit
    * runs, or single non-alphanumeric glyphs (a BPE-ish pre-tokenizer).
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Quality-scoring signals per document: length, lexical diversity,
    * stopword ratio, mean word length. The composite `quality_ok` applies
    * the usual pretraining heuristics (not too short, not too repetitive).
    */
  def quality(docs: DataFrame, stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val words = split(col("text"), " ")
    docs.select(
      col("doc_id").cast("string").as("doc_id"),
      size(words).cast("long").as("n_words"),
      size(array_distinct(words)).cast("long").as("n_distinct"),
      length(col("text")).cast("long").as("n_chars"),
      size(filter(words, w => w.isin(stopwords.map(x => x: Any): _*)))
        .cast("long").as("n_stop"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / col("n_words").cast("double"))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_words").cast("double"))
      .withColumn("mean_word_len",
        (col("n_chars") - col("n_words") + 1).cast("double") / col("n_words").cast("double"))
      .withColumn("quality_ok",
        col("n_words") >= 10 && col("distinct_ratio") >= 0.2 && col("stop_ratio") <= 0.5)
  }

  /** Token counting: whitespace tokens and BPE-ish regex tokens. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("string").as("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpeishPattern), lit(0)))
        .cast("long").as("bpe_tokens"))

  /** Corpus-trained language identification: score(doc, lang) = Σ over the
    * doc's words (with multiplicity) of that word's frequency in lang's
    * training slice — integer arithmetic end to end, so the argmax is
    * bit-deterministic and reproducible in any engine. Ties break to the
    * lexicographically smallest language. (With a shared synthetic vocab
    * this is a structural-skew classifier, not linguistics — the operator
    * under test is the broadcast model + explode + argmax pipeline.)
    */
  def langId(docs: DataFrame): DataFrame = {
    val words = docs.select(
      col("doc_id").cast("string").as("doc_id"),
      col("lang"),
      explode(split(col("text"), " ")).as("word"))
    // model: per-(word, lang) counts over the corpus — tiny, broadcastable
    val model = words.groupBy("word", "lang")
      .agg(count(lit(1)).as("w_cnt"))
      .withColumnRenamed("lang", "cand_lang")
    val scored = words.join(broadcast(model), "word")
      .groupBy("doc_id", "lang", "cand_lang")
      .agg(sum("w_cnt").cast("long").as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cand_lang"))
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(
        col("doc_id"),
        col("lang").as("lang_actual"),
        col("cand_lang").as("lang_pred"),
        col("score"),
        (col("cand_lang") === col("lang")).as("hit"))
  }

  /** Rolling polynomial fingerprint of the word sequence (mod 2^31-1,
    * base 31): order-sensitive, engine-reproducible with exact integer
    * arithmetic that never exceeds 2^36 (ANSI-overflow-safe in any engine).
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val p = lit(2147483647L) // 2^31 - 1
    val words = split(col("text"), " ")
    // Horner over word hashes: h = (h * 31 + wordScore) mod p, where
    // wordScore = length-weighted first/last char codes (integer, portable)
    // first char, last char (via reverse — negative substring offsets are
    // not portable), and length: all exact integers in any engine
    val wordScore: Column => Column = w =>
      (ascii(substring(w, 1, 1)).cast("long") * 131L +
        ascii(substring(reverse(w), 1, 1)).cast("long") * 31L +
        length(w).cast("long")) % p
    docs.select(
      col("doc_id").cast("string").as("doc_id"),
      aggregate(words, lit(0L),
        (acc, w) => (acc * 31L + wordScore(w)) % p).as("fingerprint"))
  }
}
