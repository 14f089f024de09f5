package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.functions._

import graft.expr.{GraftAudioProbe, GraftBmp, GraftFrameSample, GraftMediaFeatures, GraftMediaProbe, GraftWav}

/** Multimodal pipeline plumbing: media as opaque binary columns + typed
  * metadata, decode/feature/frame-sample as native codegen'd expressions
  * (the Scala analogue of a mapInPandas decode stage — same batch shape, no
  * Python). The decoders parse REAL container formats — 24-bit BMP and
  * RIFF/WAVE PCM — entirely in the JVM (MediaExpressions.scala); compressed
  * codecs would slot behind the same signatures with a library present.
  */
object Multimodal {

  def media_probe(c: Column): Column = GraftSql.column(GraftMediaProbe(GraftSql.expression(c)))
  def audio_probe(c: Column): Column = GraftSql.column(GraftAudioProbe(GraftSql.expression(c)))
  def media_features(c: Column, dims: Int): Column =
    GraftSql.column(GraftMediaFeatures(GraftSql.expression(c), dims))
  def frame_sample(c: Column, frameBytes: Int, step: Int): Column =
    GraftSql.column(GraftFrameSample(GraftSql.expression(c), frameBytes, step))

  def bmp(width: Column, height: Column, seed: Column): Column =
    GraftSql.column(GraftBmp(
      GraftSql.expression(width), GraftSql.expression(height), GraftSql.expression(seed)))

  def wav(channels: Column, sampleRate: Column, nSamples: Column, seed: Column): Column =
    GraftSql.column(GraftWav(
      GraftSql.expression(channels), GraftSql.expression(sampleRate),
      GraftSql.expression(nSamples), GraftSql.expression(seed)))

  /** Deterministic synthetic image table from documents: each row carries a
    * REAL 24-bit BMP whose dimensions derive from n_chars and whose pixel
    * bytes cycle the document text (small dims keep the table compact).
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("string").as("doc_id"),
      bmp(
        (col("n_chars") % 32 + 4).cast("int"),
        (col("n_chars") % 24 + 4).cast("int"),
        encode(col("text"), "UTF-8")).as("media"),
      lit("image/bmp").as("media_type"))

  /** Deterministic synthetic audio table: real PCM WAV payloads. */
  def syntheticAudio(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("string").as("doc_id"),
      wav(
        (col("n_chars") % 2 + 1).cast("int"),
        lit(16000),
        (col("n_chars") % 256).cast("int"),
        encode(col("text"), "UTF-8")).as("media"),
      lit("audio/wav").as("media_type"))

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
