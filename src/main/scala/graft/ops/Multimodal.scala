package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.functions._

import graft.expr.{GraftFrameSample, GraftMediaFeatures, GraftMediaProbe, GraftMediaWrap}

/** Multimodal pipeline plumbing: media as opaque binary columns + typed
  * metadata, decode/feature/frame-sample as native expressions (the Scala
  * analogue of a mapInPandas decode stage — same batch shape, no Python).
  * The byte-level decode is a STUB (see MediaExpressions.scala); everything
  * around it — schema, range partitioning, expression pipeline — is the
  * real production shape.
  */
object Multimodal {

  def media_probe(c: Column): Column = GraftSql.column(GraftMediaProbe(GraftSql.expression(c)))
  def media_features(c: Column, dims: Int): Column =
    GraftSql.column(GraftMediaFeatures(GraftSql.expression(c), dims))
  def frame_sample(c: Column, frameBytes: Int, step: Int): Column =
    GraftSql.column(GraftFrameSample(GraftSql.expression(c), frameBytes, step))

  def media_wrap(width: Column, height: Column, body: Column): Column =
    GraftSql.column(GraftMediaWrap(
      GraftSql.expression(width), GraftSql.expression(height), GraftSql.expression(body)))

  /** Deterministic synthetic media table from documents: payload = fake
    * header (width,height derived from n_chars) + the text bytes as body.
    * Stands in for an image/audio blob column at the same schema.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("string").as("doc_id"),
      media_wrap(
        (col("n_chars") % 640 + 16).cast("int"),
        (col("n_chars") % 480 + 16).cast("int"),
        encode(col("text"), "UTF-8")).as("media"),
      lit("image/fake").as("media_type"))

  /** The full decode → feature-extract → frame-sample pipeline over a media
    * table, range-partitioned on doc_id like every other table here.
    */
  def pipeline(media: DataFrame, dims: Int = 16): DataFrame =
    media
      .withColumn("meta", media_probe(col("media")))
      .withColumn("features", media_features(col("media"), dims))
      .withColumn("frames_kept", size(frame_sample(col("media"), 64, 2)))
      .select(
        col("doc_id"), col("media_type"),
        col("meta.width"), col("meta.height"),
        col("meta.body_bytes"), col("meta.mean_byte"),
        col("features"), col("frames_kept"))
}
