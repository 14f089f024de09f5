package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.expr.MediaRuntime

/** Multimodal tests: REAL BMP / WAV container parsing (hand-built fixtures
  * checked byte-by-byte against the public format specs), feature
  * extraction shape, frame sampling — plus the pipeline on the real
  * documents table.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("hand-built BMP fixture parses exactly (header layout per spec)") {
    // 3x2 px, 24-bit: rowSize = ((3*3+3)/4)*4 = 12, body = 24
    val seed = Array.tabulate(5)(i => (i * 50).toByte)
    val b = MediaRuntime.bmp(3, 2, seed)
    assert(b.length == 54 + 24)
    assert(b(0) == 'B' && b(1) == 'M')
    // file header: size at 2, pixel offset 54 at 10
    assert((b(10) & 0xFF) == 54)
    // info header: width 3 at 18, height 2 at 22, planes 1, bpp 24, BI_RGB
    assert((b(18) & 0xFF) == 3 && (b(22) & 0xFF) == 2)
    assert((b(26) & 0xFF) == 1 && (b(28) & 0xFF) == 24 && (b(30) & 0xFF) == 0)
    // pixel bytes cycle the seed
    assert(b(54) == seed(0) && b(55) == seed(1) && b(54 + 5) == seed(0))
    // probe parses it back
    val row = MediaRuntime.probe(b)
    assert(row.getInt(0) == 3 && row.getInt(1) == 2 && row.getLong(2) == 24L)
    // truncated / alien payloads fail loud, never return garbage
    intercept[IllegalArgumentException](
      MediaRuntime.probe(java.util.Arrays.copyOf(b, 60)))
    intercept[IllegalArgumentException](
      MediaRuntime.probe(Array.fill[Byte](60)(7)))
  }

  test("hostile BMP headers fail loud (negative height, huge width, bad offset)") {
    def patched(off: Int, v: Int): Array[Byte] = {
      val b = MediaRuntime.bmp(3, 2, Array[Byte](1, 2, 3))
      b(off) = (v & 0xFF).toByte
      b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte
      b(off + 3) = ((v >> 24) & 0xFF).toByte
      b
    }
    // negative height (legal top-down BMP elsewhere; here it must not
    // produce a negative body size that slips past the truncation guard)
    intercept[IllegalArgumentException](MediaRuntime.probe(patched(22, -2)))
    // width large enough to overflow rowSize*height in Int
    intercept[IllegalArgumentException](MediaRuntime.probe(patched(18, 0x7FFFFFF0)))
    intercept[IllegalArgumentException](MediaRuntime.probe(patched(18, -3)))
    // pixel-data offset before the header end / past the payload
    intercept[IllegalArgumentException](MediaRuntime.probe(patched(10, 4)))
    intercept[IllegalArgumentException](MediaRuntime.probe(patched(10, 100000)))
    intercept[IllegalArgumentException](MediaRuntime.bodyOffset(patched(10, 4)))
    intercept[IllegalArgumentException](MediaRuntime.bodyOffset(patched(10, 100000)))
  }

  test("hand-built WAV fixture parses exactly (RIFF/fmt/data chunks)") {
    val seed = Array.tabulate(8)(i => (i + 1).toByte)
    val w = MediaRuntime.wav(channels = 2, sampleRate = 16000, nSamples = 10, seed)
    assert(w.length == 44 + 10 * 4) // 10 samples * 2ch * 16-bit
    assert(new String(w, 0, 4) == "RIFF" && new String(w, 8, 4) == "WAVE")
    assert(new String(w, 12, 4) == "fmt " && new String(w, 36, 4) == "data")
    val row = MediaRuntime.audioProbe(w)
    assert(row.getInt(0) == 2 && row.getInt(1) == 16000 && row.getInt(2) == 16)
    assert(row.getLong(3) == 10L && row.getLong(4) == 40L)
    // body offset walks chunks to the data payload
    assert(MediaRuntime.bodyOffset(w) == 44)
    intercept[IllegalArgumentException](MediaRuntime.audioProbe(Array.fill[Byte](50)(1)))
  }

  test("bmp → probe over the documents table matches the size derivation") {
    val media = Multimodal.syntheticMedia(docs)
    val out = Multimodal.pipeline(media, dims = 16)
    assert(out.count() == 500)
    // header fields match their derivation from n_chars; body = padded rows
    val joined = out.join(
      docs.select(col("doc_id").cast("string").as("doc_id"), col("n_chars")),
      "doc_id")
    val w = (col("n_chars") % 32 + 4).cast("int")
    val h = (col("n_chars") % 24 + 4).cast("int")
    val rowSize = floor((w * 3 + 3) / 4) * 4
    assert(joined.where(
      col("width") =!= w || col("height") =!= h ||
        col("body_bytes") =!= (rowSize * h).cast("long")).count() == 0)
    // features: 16 dims, L1 sums to ~1 for non-empty bodies
    val bad = out.select(
      size(col("features")).as("d"),
      aggregate(col("features"), lit(0.0), (a, x) => a + x.cast("double")).as("s"))
      .where(col("d") =!= 16 || abs(col("s") - 1.0) > 1e-3)
    assert(bad.count() == 0)
  }

  test("audio probe over a synthetic WAV table decodes every header") {
    val audio = Multimodal.syntheticAudio(docs)
    val out = audio.select(col("doc_id"), Multimodal.audio_probe(col("media")).as("a"))
      .select(col("doc_id"), col("a.channels"), col("a.sample_rate"), col("a.n_samples"))
      .join(docs.select(col("doc_id").cast("string").as("doc_id"), col("n_chars")), "doc_id")
    assert(out.where(
      col("channels") =!= (col("n_chars") % 2 + 1).cast("int") ||
        col("sample_rate") =!= 16000 ||
        col("n_samples") =!= (col("n_chars") % 256).cast("long")).count() == 0)
  }

  test("frame sampling keeps every step-th fixed-size frame of the pixel body") {
    val media = Multimodal.syntheticMedia(docs)
    val out = media.select(
      octet_length(col("media")).as("len"),
      size(Multimodal.frame_sample(col("media"), 64, 2)).as("kept"))
    // kept = ceil(floor((len - 54 header bytes)/64) / 2)
    assert(out.where(
      col("kept") =!= ceil(floor((col("len") - 54) / 64) / 2).cast("int")).count() == 0)
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
