package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Multimodal columns: media payloads ride as opaque `binary` columns with
  * typed metadata. The decoders here parse REAL uncompressed container
  * formats — BMP (BITMAPINFOHEADER, 24-bit) for images and RIFF/WAVE PCM
  * for audio — entirely in the JVM (this container ships no media
  * libraries, and these formats need none). Compressed codecs (JPEG, MP3…)
  * would slot in behind the same expression signatures with a library on
  * the classpath.
  *
  * All byte-offset arithmetic below follows the public format specs:
  * BMP = 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER + bottom-up
  * rows padded to 4 bytes; WAV = RIFF header + `fmt ` chunk + `data` chunk.
  */
object MediaRuntime {

  private def intLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def shortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }

  private def putShortLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M'

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  def bmpRowSize(width: Int): Int = {
    // Long intermediate: width * 3 overflows Int past ~715M, which would
    // let a hostile header turn the row size negative
    val r = ((width.toLong * 3 + 3) / 4) * 4
    require(r >= 0 && r <= Int.MaxValue, s"BMP row size out of range for width $width")
    r.toInt
  }

  /** Build a real 24-bit BMP: pixel bytes cycle through `seed` (a
    * deterministic stand-in for real pixel content in synthesis and tests;
    * the format on disk is exactly what any image viewer would parse).
    */
  def bmp(width: Int, height: Int, seed: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val rowSize = bmpRowSize(width)
    val imageSize = rowSize * height
    val out = new Array[Byte](54 + imageSize)
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, out.length) // file size
    putIntLE(out, 10, 54) // pixel data offset
    putIntLE(out, 14, 40) // BITMAPINFOHEADER size
    putIntLE(out, 18, width)
    putIntLE(out, 22, height)
    putShortLE(out, 26, 1) // planes
    putShortLE(out, 28, 24) // bits per pixel
    putIntLE(out, 30, 0) // BI_RGB (uncompressed)
    putIntLE(out, 34, imageSize)
    var i = 0
    while (i < imageSize) {
      out(54 + i) = if (seed.length == 0) 0 else seed(i % seed.length)
      i += 1
    }
    out
  }

  /** Pixel-data offset (BMP) / sample-data offset (WAV) / loud failure. */
  def bodyOffset(b: Array[Byte]): Int =
    if (isBmp(b)) {
      // validate instead of trusting: a hostile offset would make the
      // downstream feature/frame loops index out of bounds or silently
      // skip every byte
      val off = intLE(b, 10)
      require(off >= 54 && off <= b.length,
        s"corrupt BMP: pixel-data offset $off outside [54, ${b.length}]")
      off
    }
    else if (isWav(b)) {
      // walk RIFF chunks to the `data` chunk
      var off = 12
      while (off + 8 <= b.length) {
        val size = intLE(b, off + 4)
        // a corrupt/hostile chunk size must fail loud, not spin the task
        // forever (size ≤ -8 makes the step non-positive) or walk backwards
        require(size >= 0, s"corrupt WAV chunk size $size at offset $off")
        if (b(off) == 'd' && b(off + 1) == 'a' && b(off + 2) == 't' && b(off + 3) == 'a')
          return off + 8
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      throw new IllegalArgumentException("WAV payload has no data chunk")
    } else throw new IllegalArgumentException(
      s"unsupported media payload (magic ${b.take(2).map(x => f"${x & 0xFF}%02x").mkString})")

  /** Parse a BMP header + body statistics: (width, height, body_bytes,
    * mean_byte). Validates the header instead of trusting it.
    */
  def probe(bytes: Array[Byte]): InternalRow = {
    require(isBmp(bytes), "graft_media_probe expects a BMP payload")
    val width = intLE(bytes, 18)
    val height = intLE(bytes, 22)
    val bpp = shortLE(bytes, 28)
    val compression = intLE(bytes, 30)
    require(bpp == 24 && compression == 0,
      s"unsupported BMP variant: bpp=$bpp compression=$compression")
    // reject dimensions the 24-bit bottom-up path can't represent (a
    // negative height is a legal top-down BMP, but computing body size
    // from it in Int would go negative and slip past the truncation
    // guard, yielding garbage stats instead of failing loud)
    require(width > 0 && height > 0,
      s"unsupported BMP dimensions: ${width}x$height")
    val off = intLE(bytes, 10)
    require(off >= 54 && off <= bytes.length,
      s"corrupt BMP: pixel-data offset $off outside [54, ${bytes.length}]")
    // Long arithmetic: width near Int.MaxValue overflows rowSize * height
    val body = bmpRowSize(width).toLong * height
    require(off + body <= bytes.length,
      s"truncated BMP: declared $body pixel bytes at $off, have ${bytes.length}")
    val bodyI = body.toInt // proven <= bytes.length above
    var sum = 0L
    var i = off
    while (i < off + bodyI) { sum += bytes(i) & 0xFF; i += 1 }
    val mean = if (bodyI == 0) 0.0 else sum.toDouble / bodyI
    InternalRow(width, height, body, mean)
  }

  /** Build a real RIFF/WAVE PCM file: 16-bit samples cycle through `seed`. */
  def wav(channels: Int, sampleRate: Int, nSamples: Int, seed: Array[Byte]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nSamples >= 0)
    val blockAlign = channels * 2
    val dataSize = nSamples * blockAlign
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putIntLE(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putIntLE(out, 16, 16) // fmt chunk size
    putShortLE(out, 20, 1) // PCM
    putShortLE(out, 22, channels)
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate * blockAlign) // byte rate
    putShortLE(out, 32, blockAlign)
    putShortLE(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putIntLE(out, 40, dataSize)
    var i = 0
    while (i < dataSize) {
      out(44 + i) = if (seed.length == 0) 0 else seed(i % seed.length)
      i += 1
    }
    out
  }

  /** Parse a WAV header: (channels, sample_rate, bits, n_samples,
    * body_bytes).
    */
  def audioProbe(bytes: Array[Byte]): InternalRow = {
    require(isWav(bytes), "graft_audio_probe expects a RIFF/WAVE payload")
    require(bytes(12) == 'f' && bytes(13) == 'm' && bytes(14) == 't',
      "WAV payload missing fmt chunk")
    val channels = shortLE(bytes, 22)
    val sampleRate = intLE(bytes, 24)
    val bits = shortLE(bytes, 34)
    val dataOff = bodyOffset(bytes)
    val dataSize = intLE(bytes, dataOff - 4)
    require(dataSize >= 0 && dataOff + dataSize <= bytes.length,
      "truncated or corrupt WAV data chunk")
    val blockAlign = channels * (bits / 8)
    val nSamples = if (blockAlign == 0) 0L else dataSize.toLong / blockAlign
    InternalRow(channels, sampleRate, bits, nSamples, dataSize.toLong)
  }

  /** Feature extraction over the DECODED body bytes (pixels / samples): a
    * `dims`-bucket histogram, L1-normalized — the deterministic stand-in
    * for an embedding model at the same expression shape (binary →
    * array<float>).
    */
  def features(bytes: Array[Byte], dims: Int): UnsafeArrayData = {
    val off = bodyOffset(bytes)
    val counts = new Array[Int](dims)
    var i = off
    while (i < bytes.length) {
      counts((bytes(i) & 0xFF) % dims) += 1
      i += 1
    }
    val body = math.max(1, bytes.length - off)
    val out = new Array[Float](dims)
    i = 0
    while (i < dims) { out(i) = counts(i).toFloat / body; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Frame sampling: split the body into fixed-size frames and keep every
    * `step`-th — the batch-shape part of a video/audio pipeline.
    */
  def frameSample(bytes: Array[Byte], frameBytes: Int, step: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val off = bodyOffset(bytes)
    val body = bytes.length - off
    val nFrames = math.max(0, body / frameBytes)
    val kept = Seq.range(0, nFrames, step).map { f =>
      java.util.Arrays.copyOfRange(bytes, off + f * frameBytes, off + (f + 1) * frameBytes)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(kept.toArray[Any])
  }
}

/** `graft_bmp(width, height, seed)` -> a real 24-bit BMP binary (synthesis
  * helper — the inverse of the probe).
  */
case class GraftBmp(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != IntegerType || second.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects (int, int, binary)")
    else GraftTypeCheck.binary(third, prettyName)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bmp"

  override protected def nullSafeEval(w: Any, h: Any, b: Any): Any =
    MediaRuntime.bmp(w.asInstanceOf[Int], h.asInstanceOf[Int], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, h, b) => s"graft.expr.MediaRuntime.bmp($w, $h, $b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GraftBmp =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_media_probe(binary)` -> struct(width, height, body_bytes,
  * mean_byte): real BMP header parse + pixel statistics.
  */
case class GraftMediaProbe(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.binary(child, prettyName)
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("body_bytes", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)))
  override def prettyName: String = "graft_media_probe"

  override protected def nullSafeEval(input: Any): Any =
    MediaRuntime.probe(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MediaRuntime.probe($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftMediaProbe =
    copy(child = newChild)
}

/** `graft_audio_probe(binary)` -> struct(channels, sample_rate, bits,
  * n_samples, body_bytes): real RIFF/WAVE header parse.
  */
case class GraftAudioProbe(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.binary(child, prettyName)
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("body_bytes", LongType, nullable = false)))
  override def prettyName: String = "graft_audio_probe"

  override protected def nullSafeEval(input: Any): Any =
    MediaRuntime.audioProbe(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MediaRuntime.audioProbe($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftAudioProbe =
    copy(child = newChild)
}

/** `graft_wav(channels, sampleRate, nSamples, seed)` -> a real PCM WAV. */
case class GraftWav(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != IntegerType || second.dataType != IntegerType ||
      third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects (int, int, int, binary)")
    else GraftTypeCheck.binary(fourth, prettyName)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_wav"

  override protected def nullSafeEval(c: Any, r: Any, n: Any, s: Any): Any =
    MediaRuntime.wav(c.asInstanceOf[Int], r.asInstanceOf[Int],
      n.asInstanceOf[Int], s.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r, n, s) => s"graft.expr.MediaRuntime.wav($c, $r, $n, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): GraftWav =
    copy(first = f, second = s, third = t, fourth = q)
}

case class GraftMediaFeatures(child: Expression, dims: Int) extends UnaryExpression {
  require(dims > 0 && dims <= 4096, s"dims out of range: $dims")
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.binary(child, prettyName)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_media_features"

  override protected def nullSafeEval(input: Any): Any =
    MediaRuntime.features(input.asInstanceOf[Array[Byte]], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MediaRuntime.features($c, $dims)")

  override protected def withNewChildInternal(newChild: Expression): GraftMediaFeatures =
    copy(child = newChild)
}

case class GraftFrameSample(child: Expression, frameBytes: Int, step: Int)
    extends UnaryExpression {
  require(frameBytes > 0 && step > 0, s"bad frame/step: $frameBytes/$step")
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.binary(child, prettyName)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "graft_frame_sample"

  override protected def nullSafeEval(input: Any): Any =
    MediaRuntime.frameSample(input.asInstanceOf[Array[Byte]], frameBytes, step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MediaRuntime.frameSample($c, $frameBytes, $step)")

  override protected def withNewChildInternal(newChild: Expression): GraftFrameSample =
    copy(child = newChild)
}
