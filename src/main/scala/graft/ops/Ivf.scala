package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour over an embeddings
  * table — the second scale path beside [[Similarity.lshTopK]], trading
  * LSH's stateless hashing for a small trained coarse quantizer:
  *
  *   - centroids: the √n-ish corpus vectors with the smallest
  *     xxhash64(vec_id) — a value-determined, layout-independent pick (the
  *     usual k-means refinement is an optional improvement; a hash-strided
  *     sample is already an unbiased quantizer for recall purposes and
  *     keeps the index deterministic);
  *   - assignment: ONE corpus scan with a broadcast of L2-normalized
  *     centroids; the argmax-dot kernel is a native codegen'd expression
  *     ([[graft.expr.IvfAssign]]) — at 10^12 rows this is the only
  *     full-data pass, and it is map-only;
  *   - search: each query probes its `nprobe` nearest lists (multi-probe,
  *     [[graft.expr.IvfProbes]]), candidates come from an equi-join on the
  *     list id (shuffle keyed by a small int, never all-pairs), exact
  *     cosine ranks only the candidates.
  */
object Ivf {

  final case class Index(
      centroids: Broadcast[Array[Array[Float]]],
      /** (cid, vec_id, embedding) — the corpus with its list assignment. */
      assigned: DataFrame)

  private def assignCol(emb: Column, bc: Broadcast[Array[Array[Float]]]): Column =
    org.apache.spark.sql.GraftSql.column(graft.expr.IvfAssign(
      org.apache.spark.sql.GraftSql.expression(emb), bc))

  private def probesCol(
      emb: Column, bc: Broadcast[Array[Array[Float]]], nprobe: Int): Column =
    org.apache.spark.sql.GraftSql.column(graft.expr.IvfProbes(
      org.apache.spark.sql.GraftSql.expression(emb), bc, nprobe))

  /** Deterministic coarse quantizer: k corpus vectors by hash order of
    * vec_id, L2-normalized (centroid ranking by cosine ≡ by dot product).
    */
  def trainCentroids(corpus: DataFrame, k: Int): Broadcast[Array[Array[Float]]] = {
    val spark = corpus.sparkSession
    val picked = corpus
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(k)
      .select("embedding")
      .collect()
    val cents = picked.map { r =>
      val e = r.getSeq[Float](0).toArray
      var ss = 0.0
      var i = 0
      while (i < e.length) { ss += e(i).toDouble * e(i); i += 1 }
      val norm = math.sqrt(ss)
      if (norm == 0.0) e else e.map(x => (x / norm).toFloat)
    }
    spark.sparkContext.broadcast(cents)
  }

  /** Build the index: train the quantizer, assign every corpus vector to
    * its list in one map-only scan.
    */
  def build(corpus: DataFrame, numCentroids: Int): Index = {
    val bc = trainCentroids(corpus, numCentroids)
    val assigned = corpus.select(
      assignCol(col("embedding"), bc).as("cid"),
      col("vec_id").cast("long").as("vec_id"),
      col("embedding"))
    Index(bc, assigned)
  }

  /** Approximate top-k: probe `nprobe` lists per query. With
    * nprobe = numCentroids this degenerates to exact search (useful as a
    * plumbing check); recall rises steeply with nprobe because near
    * neighbours concentrate in the query's nearest lists.
    * Output: (query_id, rank, vec_id, cosine) like [[Similarity.bruteForceTopK]].
    */
  def topK(index: Index, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").cast("long").as("query_id"),
      col("embedding").as("q_emb"),
      probesCol(col("embedding"), index.centroids, nprobe).as("probes"))
    val qProbes = q.select(
      col("query_id"), col("q_emb"), explode(col("probes")).as("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    index.assigned
      .join(broadcast(qProbes), "cid")
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id"),
        Similarity.cosine(col("embedding"), col("q_emb")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
  }
}
