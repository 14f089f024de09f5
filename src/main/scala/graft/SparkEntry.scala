package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.table.Tokenize

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is DuckDB-oracle-checkable (Verify.scala dumps results +
  * oracle_sql.json; the driver compares row/schema/hash). Column names and
  * types are aligned on both sides: all counts/sums cast to BIGINT, no
  * floating-point aggregates in hashed output.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_source_stats")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E2 tokenize: per-doc token counts + positional checksum
    "q_tokenize" -> ((s, dir) => {
      Tokenize.tokenTable(s, dir)
        .select(
          col("doc_id"),
          col("n_tok").cast("long").as("n_tok"),
          Tokenize.checksumCol(col("tokens")).as("checksum"),
          array_min(col("tokens")).cast("long").as("t_min"),
          array_max(col("tokens")).cast("long").as("t_max"))
        .orderBy(col("doc_id").cast("long"))
    }),

    // E2/E3 vocab discovery (sorted distinct words with frequencies)
    "q_vocab" -> ((s, dir) => {
      Tokenize.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .withColumn("token_id",
          (row_number().over(Window.orderBy("word")) - 1).cast("long"))
        .select(col("token_id"), col("word"), col("cnt").cast("long").as("cnt"))
        .orderBy("word")
    }),

    // internal relational machinery: per-source aggregation over the
    // synthesized token table
    "q_source_stats" -> ((s, dir) => {
      Tokenize.tokenTable(s, dir).toDF()
        .groupBy("source")
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(col("n_tok").cast("long")).as("tokens"),
          min(col("n_tok")).cast("long").as("min_tok"),
          max(col("n_tok")).cast("long").as("max_tok"),
          sum(Tokenize.checksumCol(col("tokens"))).as("checksum_sum"))
        .orderBy("source")
    }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_tokenize" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents
        |)
        |SELECT CAST(p.doc_id AS VARCHAR) AS doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tok,
        |       CAST(sum(v.tid * p.pos) AS BIGINT) AS checksum,
        |       CAST(min(v.tid) AS BIGINT) AS t_min,
        |       CAST(max(v.tid) AS BIGINT) AS t_max
        |FROM pairs p JOIN vocab v ON v.word = p.word
        |GROUP BY p.doc_id
        |ORDER BY CAST(p.doc_id AS BIGINT)""".stripMargin,

    "q_vocab" ->
      """WITH words AS (SELECT unnest(string_split(text,' ')) AS word FROM documents)
        |SELECT CAST(row_number() OVER (ORDER BY word) - 1 AS BIGINT) AS token_id,
        |       word,
        |       CAST(cnt AS BIGINT) AS cnt
        |FROM (SELECT word, count(*) AS cnt FROM words GROUP BY word)
        |ORDER BY word""".stripMargin,

    "q_source_stats" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, source, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents
        |), per_doc AS (
        |  SELECT p.doc_id, p.source, count(*) AS n_tok, sum(v.tid * p.pos) AS checksum
        |  FROM pairs p JOIN vocab v ON v.word = p.word
        |  GROUP BY p.doc_id, p.source
        |)
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(n_tok) AS BIGINT) AS tokens,
        |       CAST(min(n_tok) AS BIGINT) AS min_tok,
        |       CAST(max(n_tok) AS BIGINT) AS max_tok,
        |       CAST(sum(checksum) AS BIGINT) AS checksum_sum
        |FROM per_doc
        |GROUP BY source
        |ORDER BY source""".stripMargin)
}
