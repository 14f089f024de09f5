package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.SketchRuntime

/** Similarity search over an embeddings table (vec_id, embedding:
  * array<float>, ...).
  *
  * The exact path broadcasts the (small) query set against the corpus —
  * one scan, no shuffle of the corpus, window top-k per query. The scale
  * path buckets by random-hyperplane sign signatures so candidate
  * generation is linear and the quadratic step happens only within a
  * bucket (the same IVF/LSH shape used for billion-vector corpora).
  */
object Similarity {

  /** Exact cosine similarity of two float-array columns, computed in
    * double precision (deterministic, engine-portable). Native codegen'd
    * expression — the HOF (zip_with+aggregate) formulation computes the
    * same doubles but interpreted, ~18× slower on all-pairs scans.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(graft.expr.CosineSim(
      org.apache.spark.sql.GraftSql.expression(a),
      org.apache.spark.sql.GraftSql.expression(b)))

  /** Deterministic pseudo-random hyperplane sign signature: bit p of the
    * result is the sign of Σ_d w(p,d)·v[d], with w(p,d) a fixed hash-derived
    * weight in [-1, 1). Used as an LSH bucket id for angular similarity.
    * Native codegen'd expression with a per-JVM cached weight matrix — the
    * HOF (transform/zip_with/aggregate) formulation hashed (plane, dim) per
    * row per element, interpreted.
    */
  def hyperplaneSig(embedding: Column, planes: Int): Column =
    org.apache.spark.sql.GraftSql.column(graft.expr.HyperplaneSig(
      org.apache.spark.sql.GraftSql.expression(embedding), planes))

  /** OR-construction band keys over a hyperplane signature: one signature
    * of bands×rowsPerBand sign bits, sliced into `bands` keys of
    * `rowsPerBand` bits each. Two vectors are LSH candidates iff they agree
    * on ALL bits of SOME band: P(candidate) = 1-(1-p^r)^B with
    * p = 1 - θ/π per bit — the banding turns per-bit agreement into a
    * tunable recall curve exactly like MinHash banding does for Jaccard.
    * rowsPerBand·bands ≤ 63 (one long signature, computed ONCE per row).
    */
  def hyperplaneBandKeys(embedding: Column, bands: Int, rowsPerBand: Int): Column =
    org.apache.spark.sql.GraftSql.column(graft.expr.HyperplaneBands(
      org.apache.spark.sql.GraftSql.expression(embedding), bands, rowsPerBand))

  /** Exact top-k neighbours for each query vector: broadcast the query set,
    * score every corpus vector, keep k per query. Output:
    * (query_id, rank, vec_id, cosine).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.alias("c")
      .crossJoin(broadcast(queries.select(
        col("vec_id").cast("long").as("query_id"),
        col("embedding").as("q_emb"))))
      .where(col("c.vec_id").cast("long") =!= col("query_id"))
      .select(
        col("query_id"),
        col("c.vec_id").cast("long").as("vec_id"),
        cosine(col("c.embedding"), col("q_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
  }

  /** Approximate top-k via banded hyperplane LSH: a corpus vector is a
    * candidate for a query iff their signatures agree on some full band.
    * Candidate generation is corpus-linear (bands explode ids only — the
    * embedding never rides the band join), queries broadcast, exact cosine
    * scores only the candidate set, window top-k per query. Same output
    * shape as [[bruteForceTopK]].
    *
    * Recall tuning: per-neighbor P(candidate) = 1-(1-p^r)^B, p = 1-θ/π.
    * The default (24 bands × 2 bits) gives ≥ 0.997 even for weak
    * cosine-0.25 neighbours; fewer, wider bands trade recall for a smaller
    * candidate set when neighbours are known to be high-cosine.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      bands: Int = 24, rowsPerBand: Int = 2): DataFrame = {
    val corpusIds = corpus.select(
      col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val queryIds = queries.select(
      col("vec_id").cast("long").as("query_id"), col("embedding").as("q_emb"))

    val cBand = corpusIds.select(
        col("vec_id"),
        posexplode(hyperplaneBandKeys(col("embedding"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val qBand = queryIds.select(
        col("query_id"),
        posexplode(hyperplaneBandKeys(col("q_emb"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    val cand = cBand.join(broadcast(qBand), Seq("band", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand
      .join(corpusIds, "vec_id")
      .join(broadcast(queryIds), "query_id")
      .select(
        col("query_id"), col("vec_id"),
        cosine(col("embedding"), col("q_emb")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
  }
}
