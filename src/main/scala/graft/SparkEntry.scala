package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{graft_decode, graft_encode}
import graft.table.{GraftTable, Tokenize}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is DuckDB-oracle-checkable (Verify.scala dumps results +
  * oracle_sql.json; the driver compares row/schema/hash). Column names and
  * types are aligned on both sides: all counts/sums cast to BIGINT, no
  * floating-point aggregates in hashed output.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the whole engine: tokenize → stats → block encode → manifest
    * → decode → per-source aggregation of the decoded table.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_roundtrip_table")(spark, "/root/testdata/sf0.001")

  /** Encode the sfDir token table into a deterministic scratch location
    * (idempotent: a complete table resumes as a no-op) and return its dir.
    * Path carries a format tag so stale tables from older code never leak in.
    */
  private def encodedTableDir(spark: SparkSession, sfDir: String): String = {
    val dir = "/tmp/graft-tables/f1-" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    GraftTable.encode(
      Tokenize.tokenTable(spark, sfDir).toDF(), dir,
      GraftTable.Options(targetRowsPerBlock = 128))
    dir
  }

  private val codecNames =
    Seq("plain", "bitpack", "for", "delta_for", "rle", "dict", "fsst")

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
    }),

    // E4+E10+E11: FULL pipeline — encode into the Iceberg-shaped table,
    // decode it back, aggregate the DECODED rows. Matching the oracle
    // (computed from raw documents) proves bit-identical round-trip
    // through block assembly, codecs, parquet, and manifest resume.
    "q_roundtrip_table" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      GraftTable.decode(s, tdir).toDF()
        .groupBy("source")
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(col("n_tok").cast("long")).as("tokens"),
          sum(Tokenize.checksumCol(col("tokens"))).as("checksum_sum"))
        .orderBy("source")
    }),

    // E11 verify as a query: decoded ⋈ source equi-join, mismatches must
    // be zero (the oracle asserts the constant — reachable only if the
    // engine's decode is bit-identical for every row)
    "q_verify_mismatch" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      val src = Tokenize.tokenTable(s, dir).toDF().alias("s")
      val dec = GraftTable.decode(s, tdir).toDF().alias("d")
      dec.join(src, "doc_id")
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(when(col("d.tokens") <=> col("s.tokens") and
            (col("d.source") <=> col("s.source")) and
            (col("d.n_tok") <=> col("s.n_tok")), 0L).otherwise(1L))
            .as("mismatches"))
    }),

    // E8a–E8e: every codec family forced over every row, decoded, and
    // checksummed — one result row per codec, all equal to the source
    "q_codec_roundtrip" -> ((s, dir) => {
      val base = Tokenize.tokenTable(s, dir).toDF()
      codecNames.map { c =>
        base.select(
          lit(c).as("codec"),
          col("n_tok"),
          graft_decode(graft_encode(col("tokens"), c)).as("decoded"))
          .agg(
            first(lit(c)).as("codec"),
            count(lit(1)).cast("long").as("docs"),
            sum(size(col("decoded")).cast("long")).as("tokens"),
            sum(Tokenize.checksumCol(col("decoded"))).as("checksum_sum"))
      }.reduce(_ unionAll _).orderBy("codec")
    }),

    // E4/E16: per-block manifest (codec selection evidence, lineage,
    // sizes). Not SQL-expressible (block bounds come from sampled
    // quantiles) → rows-only check.
    "q_block_manifest" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      GraftTable.readManifest(s, tdir)
        .select(
          col("block_id").cast("long").as("block_id"),
          col("ver").cast("long").as("ver"),
          col("row_count").cast("long").as("row_count"),
          col("token_count").cast("long").as("token_count"),
          col("doc_id_min"), col("doc_id_max"),
          col("codec_doc_id"), col("codec_tokens"),
          col("codec_n_tok"), col("codec_source"),
          col("bytes_total").cast("long").as("bytes_total"),
          col("plain_bytes").cast("long").as("plain_bytes"),
          col("dict_hash_tokens"))
        .orderBy("block_id")
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
        |ORDER BY source""".stripMargin,

    // proves the engine's decoded table equals the raw source: the oracle
    // recomputes the same per-source aggregates from documents directly
    "q_roundtrip_table" ->
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
        |       CAST(sum(checksum) AS BIGINT) AS checksum_sum
        |FROM per_doc
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_verify_mismatch" ->
      """SELECT CAST(count(*) AS BIGINT) AS docs,
        |       CAST(0 AS BIGINT) AS mismatches
        |FROM documents""".stripMargin,

    "q_codec_roundtrip" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents
        |), per_doc AS (
        |  SELECT p.doc_id, count(*) AS n_tok, sum(v.tid * p.pos) AS checksum
        |  FROM pairs p JOIN vocab v ON v.word = p.word
        |  GROUP BY p.doc_id
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS docs,
        |         CAST(sum(n_tok) AS BIGINT) AS tokens,
        |         CAST(sum(checksum) AS BIGINT) AS checksum_sum
        |  FROM per_doc
        |)
        |SELECT c.codec, t.docs, t.tokens, t.checksum_sum
        |FROM (VALUES ('plain'),('bitpack'),('for'),('delta_for'),('rle'),('dict'),('fsst')) c(codec)
        |CROSS JOIN tot t
        |ORDER BY c.codec""".stripMargin)
}
