package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Multimodal plumbing tests: binary payload schema, stub decode, feature
  * extraction shape, frame sampling — on the real documents table.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("wrap → probe round-trips the header and body stats") {
    val media = Multimodal.syntheticMedia(docs)
    val out = Multimodal.pipeline(media, dims = 16)
    assert(out.count() == 500)
    // header fields match their derivation from n_chars
    val joined = out.join(
      docs.select(col("doc_id").cast("string").as("doc_id"), col("n_chars")),
      "doc_id")
    assert(joined.where(
      col("width") =!= (col("n_chars") % 640 + 16).cast("int") ||
        col("height") =!= (col("n_chars") % 480 + 16).cast("int") ||
        col("body_bytes") =!= col("n_chars")).count() == 0)
    // features: 16 dims, L1 sums to ~1 for non-empty bodies
    val bad = out.select(
      size(col("features")).as("d"),
      aggregate(col("features"), lit(0.0), (a, x) => a + x.cast("double")).as("s"))
      .where(col("d") =!= 16 || abs(col("s") - 1.0) > 1e-3)
    assert(bad.count() == 0)
  }

  test("frame sampling keeps every step-th fixed-size frame") {
    val media = Multimodal.syntheticMedia(docs)
    val out = media.select(
      octet_length(col("media")).as("len"),
      size(Multimodal.frame_sample(col("media"), 64, 2)).as("kept"))
    // kept = ceil(floor((len-8)/64) / 2)
    assert(out.where(
      col("kept") =!= ceil(floor((col("len") - 8) / 64) / 2).cast("int")).count() == 0)
  }

  test("media payloads survive a parquet write/read (binary column fidelity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    val media = Multimodal.syntheticMedia(docs)
    media.write.mode("overwrite").parquet(s"$dir/media")
    val back = spark.read.parquet(s"$dir/media")
    val mism = back.alias("b").join(media.alias("m"), "doc_id")
      .where(!(col("b.media") <=> col("m.media")))
      .count()
    assert(mism == 0)
  }
}
