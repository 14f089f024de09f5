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

  private def normalized(e: Array[Float]): Array[Float] = {
    var ss = 0.0
    var i = 0
    while (i < e.length) { ss += e(i).toDouble * e(i); i += 1 }
    val norm = math.sqrt(ss)
    if (norm == 0.0) e else e.map(x => (x / norm).toFloat)
  }

  /** Deterministic coarse quantizer: init = k corpus vectors by hash order
    * of vec_id (value-determined, layout-independent), optionally refined
    * by `lloydIters` k-means steps. Lloyd sums are integer-scaled
    * (float·2^24 as long) so the partial-aggregation ADD ORDER cannot
    * perturb the centroids — double sums would make the index
    * layout-dependent. Centroids are L2-normalized (ranking by cosine ≡ by
    * dot product). Empty clusters keep their previous centroid.
    */
  def trainCentroids(
      corpus: DataFrame, k: Int, lloydIters: Int = 0): Broadcast[Array[Array[Float]]] = {
    val spark = corpus.sparkSession
    val picked = corpus
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(k)
      .select("embedding")
      .collect()
    var cents = picked.map(r => normalized(r.getSeq[Float](0).toArray))
    val scale = (1L << 24).toDouble

    var iter = 0
    while (iter < lloydIters) {
      val bc = spark.sparkContext.broadcast(cents)
      // one map-only assignment scan, then a tiny (k·dim)-row aggregate
      val stats = corpus
        .select(assignCol(col("embedding"), bc).as("cid"),
          posexplode(col("embedding")))
        .groupBy("cid", "pos")
        .agg(
          sum((col("col").cast("double") * scale).cast("long")).as("s"),
          count(lit(1)).as("c"))
        .collect()
      val next = cents.map(_.clone())
      stats.groupBy(_.getInt(0)).foreach { case (cid, rows) =>
        val dim = rows.length
        val mean = new Array[Float](dim)
        rows.foreach { r =>
          mean(r.getInt(1)) = (r.getLong(2).toDouble / scale / r.getLong(3)).toFloat
        }
        next(cid) = normalized(mean)
      }
      cents = next
      bc.unpersist(false)
      iter += 1
    }
    spark.sparkContext.broadcast(cents)
  }

  /** Build the index: train the quantizer (optionally Lloyd-refined),
    * assign every corpus vector to its list in one map-only scan.
    */
  def build(corpus: DataFrame, numCentroids: Int, lloydIters: Int = 0): Index = {
    val bc = trainCentroids(corpus, numCentroids, lloydIters)
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
