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
    */
  def hyperplaneSig(embedding: Column, planes: Int): Column = {
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val dot = aggregate(
        zip_with(
          embedding,
          transform(sequence(lit(1), size(embedding)),
            d => planeWeight(p, d)),
          (v, w) => v.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(
      zip_with(bits, sequence(lit(0), lit(planes - 1)),
        (bit, p) => call_function("shiftleft", bit, p.cast("int"))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hash-derived plane weight in [-1, 1): xxhash64(plane, dim) scaled. */
  private def planeWeight(p: Column, d: Column): Column =
    (xxhash64(p, d).cast("double") / lit(Long.MaxValue.toDouble))

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

  /** Approximate top-k: hyperplane-LSH bucket the corpus, search only the
    * query's bucket (multi-probe over exact-match bucket here; recall is
    * traded for a corpus-linear candidate set). Same output shape as
    * [[bruteForceTopK]].
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8): DataFrame = {
    val bucketed = corpus.select(
      col("vec_id").cast("long").as("vec_id"),
      col("embedding"),
      hyperplaneSig(col("embedding"), planes).as("bucket"))
    val q = queries.select(
      col("vec_id").cast("long").as("query_id"),
      col("embedding").as("q_emb"),
      hyperplaneSig(col("embedding"), planes).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    bucketed.join(broadcast(q), "bucket")
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id"),
        cosine(col("embedding"), col("q_emb")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
  }
}
