package graft.codec

import java.nio.charset.StandardCharsets

/** Codec families that extend the engine beyond the token schema to
  * arbitrary column types (SURVEY.md §2.1 R3/R4 — the ebenezer
  * any-thrift-struct capability): 64-bit integers, IEEE floats, raw binary,
  * plus two structural wrappers (null bitmap, array-of-X). All payloads
  * stay self-describing ([codecId:1B][body]) and nest through the same
  * `ByteReader` discipline as IntBlocks/StrBlocks, so cascades compose.
  *
  * Id space: IntBlocks 0–7, StrBlocks 64–66, LongBlocks 80–84,
  * wrappers/primitives 96–102.
  */
object LongBlocks {

  val L_PLAIN = 80
  val L_FOR = 81
  val L_DELTA_FOR = 82
  val L_RLE = 83
  val L_DICT = 84

  val names: Map[Int, String] = Map(
    L_PLAIN -> "l_plain", L_FOR -> "l_for", L_DELTA_FOR -> "l_delta_for",
    L_RLE -> "l_rle", L_DICT -> "l_dict")

  /** Smallest-wins trial selection (ties to the lower id), mirroring
    * IntBlocks' exactness property. Long columns are per-row scalars
    * (n ≤ rows-per-block), so constructive trials are cheap — no need for
    * the analytic sizing IntBlocks uses on multi-million-token streams.
    */
  def encodeAuto(values: Array[Long]): Array[Byte] = {
    var best = encPlain(values)
    def consider(e: Option[Array[Byte]]): Unit =
      e.foreach(b => if (b.length < best.length) best = b)
    consider(encFor(values))
    consider(encDeltaFor(values))
    consider(Some(encRle(values)))
    consider(encDict(values))
    best
  }

  // L_PLAIN: [id][vlen n][n * int64 LE]
  private def encPlain(values: Array[Long]): Array[Byte] = {
    val w = new ByteWriter(values.length * 8 + 8)
    w.putByte(L_PLAIN); w.putVarInt(values.length)
    var i = 0
    while (i < values.length) {
      val v = values(i)
      w.putIntLE(v.toInt); w.putIntLE((v >>> 32).toInt)
      i += 1
    }
    w.result()
  }

  /** Range width including overflow: None when max-min needs 64 bits (then
    * FOR degenerates to PLAIN anyway).
    */
  private def widthOf(min: Long, max: Long): Option[Int] =
    try {
      val w = BitPack.bits(Math.subtractExact(max, min))
      if (w > 63) None else Some(w)
    } catch { case _: ArithmeticException => None }

  // L_FOR: [id][vlen n][zz ref][width:1B][packed (v-ref)]
  private def encFor(values: Array[Long]): Option[Array[Byte]] = {
    val n = values.length
    if (n == 0) return None // PLAIN already minimal for n=0
    var min = Long.MaxValue; var max = Long.MinValue
    var i = 0
    while (i < n) { val v = values(i); if (v < min) min = v; if (v > max) max = v; i += 1 }
    widthOf(min, max).map { width =>
      val w = new ByteWriter(n + 16)
      w.putByte(L_FOR); w.putVarInt(n)
      w.putZigZagLong(min); w.putByte(width)
      val tmp = new Array[Long](n)
      i = 0
      while (i < n) { tmp(i) = values(i) - min; i += 1 }
      BitPack.pack(tmp, n, width, w)
      w.result()
    }
  }

  // L_DELTA_FOR: [id][vlen n][zz first][zz minDelta][width:1B][packed deltas]
  private def encDeltaFor(values: Array[Long]): Option[Array[Byte]] = {
    val n = values.length
    if (n < 2) return None
    val deltas = new Array[Long](n - 1)
    var minD = Long.MaxValue; var maxD = Long.MinValue
    var i = 1
    try {
      while (i < n) {
        val d = Math.subtractExact(values(i), values(i - 1))
        deltas(i - 1) = d
        if (d < minD) minD = d
        if (d > maxD) maxD = d
        i += 1
      }
    } catch { case _: ArithmeticException => return None }
    widthOf(minD, maxD).map { width =>
      val w = new ByteWriter(n + 24)
      w.putByte(L_DELTA_FOR); w.putVarInt(n)
      w.putZigZagLong(values(0)); w.putZigZagLong(minD); w.putByte(width)
      i = 0
      while (i < n - 1) { deltas(i) -= minD; i += 1 }
      BitPack.pack(deltas, n - 1, width, w)
      w.result()
    }
  }

  // L_RLE: [id][vlen n][(zz value, vlen runLen)*]
  private def encRle(values: Array[Long]): Array[Byte] = {
    val n = values.length
    val w = new ByteWriter(n + 8)
    w.putByte(L_RLE); w.putVarInt(n)
    var i = 0
    while (i < n) {
      val v = values(i)
      var j = i + 1
      while (j < n && values(j) == v) j += 1
      w.putZigZagLong(v); w.putVarInt(j - i)
      i = j
    }
    w.result()
  }

  // L_DICT: [id][vlen n][vlen D][zz d0][wrapped-unsigned diffs]*[nested int
  // payload of dict codes] — diffs of the SORTED dict wrap mod 2^64, which
  // varlong round-trips exactly (decode adds with the same wrapping).
  private def encDict(values: Array[Long]): Option[Array[Byte]] = {
    val n = values.length
    if (n == 0) return None
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      set.add(values(i))
      if (set.size > IntBlocks.DictCap) return None
      i += 1
    }
    if (set.size == n) return None // no repetition — dict can't win
    val dict = new Array[Long](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { dict(i) = it.next(); i += 1 }
    val idx = new java.util.HashMap[java.lang.Long, Integer](dict.length * 2)
    i = 0
    while (i < dict.length) { idx.put(dict(i), i); i += 1 }
    val codes = new Array[Int](n)
    i = 0
    while (i < n) { codes(i) = idx.get(values(i)); i += 1 }
    val w = new ByteWriter(n + 64)
    w.putByte(L_DICT); w.putVarInt(n); w.putVarInt(dict.length)
    i = 0
    while (i < dict.length) {
      if (i == 0) w.putZigZagLong(dict(0))
      else w.putVarLong(dict(i) - dict(i - 1)) // wrapping-unsigned diff
      i += 1
    }
    w.putBytes(IntBlocks.encodeAutoChoice(codes, allowDict = false, allowFsst = false)._1)
    Some(w.result())
  }

  def decode(bytes: Array[Byte]): Array[Long] = decodeReader(new ByteReader(bytes))

  def decodeReader(in: ByteReader): Array[Long] = {
    val id = in.getByte()
    id match {
      case L_PLAIN =>
        val n = in.getVarInt()
        val out = new Array[Long](n)
        var i = 0
        while (i < n) {
          val lo = in.getIntLE().toLong & 0xFFFFFFFFL
          val hi = in.getIntLE().toLong
          out(i) = (hi << 32) | lo
          i += 1
        }
        out
      case L_FOR =>
        val n = in.getVarInt()
        val ref = in.getZigZagLong()
        val width = in.getByte()
        val packed = BitPack.unpack(in, n, width)
        var i = 0
        while (i < n) { packed(i) += ref; i += 1 }
        packed
      case L_DELTA_FOR =>
        val n = in.getVarInt()
        val out = new Array[Long](n)
        out(0) = in.getZigZagLong()
        val minD = in.getZigZagLong()
        val width = in.getByte()
        val packed = BitPack.unpack(in, n - 1, width)
        var i = 1
        while (i < n) { out(i) = out(i - 1) + packed(i - 1) + minD; i += 1 }
        out
      case L_RLE =>
        val n = in.getVarInt()
        val out = new Array[Long](n)
        var i = 0
        while (i < n) {
          val v = in.getZigZagLong()
          val len = in.getVarInt()
          java.util.Arrays.fill(out, i, i + len, v)
          i += len
        }
        out
      case L_DICT =>
        val n = in.getVarInt()
        val d = in.getVarInt()
        val dict = new Array[Long](d)
        var i = 0
        while (i < d) {
          if (i == 0) dict(0) = in.getZigZagLong()
          else dict(i) = dict(i - 1) + in.getVarLong() // wrapping add
          i += 1
        }
        val codes = IntBlocks.decodeReader(in)
        val out = new Array[Long](n)
        i = 0
        while (i < n) { out(i) = dict(codes(i)); i += 1 }
        out
      case other => throw new IllegalArgumentException(s"unknown long codec id $other")
    }
  }
}

/** Primitive/structural codecs for the generic table: IEEE floats and raw
  * binary are stored losslessly (bit patterns preserved, NaN payloads
  * included); NULLABLE wraps any inner payload with a presence bitmap; ARR
  * composes a lengths stream with a flat values stream (the generic form of
  * the tokens/n_tok pairing the token table uses).
  */
object PrimBlocks {

  val NULLABLE = 96
  val F64_PLAIN = 97
  val F32_PLAIN = 98
  val BIN_PLAIN = 99
  val ARR = 100
  val F64_DEC = 101
  val F32_DEC = 102

  val names: Map[Int, String] = Map(
    NULLABLE -> "nullable", F64_PLAIN -> "f64_plain", F32_PLAIN -> "f32_plain",
    BIN_PLAIN -> "bin_plain", ARR -> "arr",
    F64_DEC -> "f64_dec", F32_DEC -> "f32_dec")

  // exact powers of ten (10^e is exactly representable in f64 up to e=22)
  private val Pow10: Array[Double] = Array.tabulate(19)(e => math.pow(10.0, e))

  /** Auto-select for doubles: decimal-scaled-integer when the values are
    * decimals in disguise (ALP-style — Afroozeh & Boncz, SIGMOD 2023:
    * scale by 10^e, verify each value round-trips BIT-exactly, store the
    * scaled longs through [[LongBlocks]] with raw-bit exceptions), else
    * raw IEEE bits. Prices/quantities/ratios compress 4–10×; truly random
    * mantissas fall back to plain after a cheap sampled probe.
    */
  def encF64(values: Array[Double]): Array[Byte] = {
    val plain = encF64Plain(values)
    encF64Dec(values) match {
      case Some(dec) if dec.length < plain.length => dec
      case _ => plain
    }
  }

  /** Auto-select for floats: same decimal-scaling trial over int32. */
  def encF32(values: Array[Float]): Array[Byte] = {
    val plain = encF32Plain(values)
    encF32Dec(values) match {
      case Some(dec) if dec.length < plain.length => dec
      case _ => plain
    }
  }

  private def exactF64(v: Double, e: Int): Long = {
    // the scaled integer when v = s / 10^e reproduces v's exact bits
    // (decode performs the same single IEEE division, so bit-equality
    // here is bit-equality there); Long.MinValue = "no"
    val s = Math.round(v * Pow10(e))
    if (s == Long.MaxValue || s == Long.MinValue) Long.MinValue
    else if (java.lang.Double.doubleToRawLongBits(s.toDouble / Pow10(e)) ==
      java.lang.Double.doubleToRawLongBits(v)) s
    else Long.MinValue
  }

  private def exactF32(v: Float, e: Int): Long = {
    val s = Math.round(v.toDouble * Pow10(e))
    if (s > Int.MaxValue || s < Int.MinValue) Long.MinValue
    else if (java.lang.Float.floatToRawIntBits((s.toDouble / Pow10(e)).toFloat) ==
      java.lang.Float.floatToRawIntBits(v)) s
    else Long.MinValue
  }

  /** Pick the smallest exponent that makes (almost) every sampled value an
    * exact scaled integer; -1 when no exponent covers ≥ 7/8 of the sample.
    */
  private def pickExponent(n: Int, maxE: Int, exact: (Int, Int) => Boolean): Int = {
    if (n == 0) return -1
    val stride = math.max(1, n / 512)
    var e = 0
    while (e <= maxE) {
      var i = 0
      var hits = 0
      var seen = 0
      while (i < n) {
        if (exact(i, e)) hits += 1
        seen += 1
        i += stride
      }
      if (hits.toLong * 8 >= seen.toLong * 7) return e
      e += 1
    }
    -1
  }

  // F64_DEC: [id][vlen n][e:1B][vlen nExc][(vlen idxDelta, 8B raw bits)*]
  //          [nested LongBlocks payload of the n scaled values]
  private def encF64Dec(values: Array[Double]): Option[Array[Byte]] = {
    val n = values.length
    val e = pickExponent(n, 14, (i, ex) => exactF64(values(i), ex) != Long.MinValue)
    if (e < 0) return None
    val scaled = new Array[Long](n)
    val excIdx = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < n) {
      val s = exactF64(values(i), e)
      if (s == Long.MinValue) { excIdx.add(i); scaled(i) = 0L } else scaled(i) = s
      i += 1
    }
    if (excIdx.size().toLong * 8 > n.toLong) return None // sample misled
    val nested = LongBlocks.encodeAuto(scaled)
    val w = new ByteWriter(nested.length + excIdx.size() * 10 + 16)
    w.putByte(F64_DEC); w.putVarInt(n); w.putByte(e); w.putVarInt(excIdx.size())
    var prev = 0
    i = 0
    while (i < excIdx.size()) {
      val idx = excIdx.get(i)
      w.putVarInt(idx - prev)
      prev = idx
      val bits = java.lang.Double.doubleToRawLongBits(values(idx))
      w.putIntLE(bits.toInt); w.putIntLE((bits >>> 32).toInt)
      i += 1
    }
    w.putBytes(nested)
    Some(w.result())
  }

  // F32_DEC: same layout with 4B raw-bit exceptions + nested IntBlocks
  private def encF32Dec(values: Array[Float]): Option[Array[Byte]] = {
    val n = values.length
    val e = pickExponent(n, 9, (i, ex) => exactF32(values(i), ex) != Long.MinValue)
    if (e < 0) return None
    val scaled = new Array[Int](n)
    val excIdx = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < n) {
      val s = exactF32(values(i), e)
      if (s == Long.MinValue) { excIdx.add(i); scaled(i) = 0 } else scaled(i) = s.toInt
      i += 1
    }
    if (excIdx.size().toLong * 8 > n.toLong) return None
    val nested = IntBlocks.encodeAutoChoice(scaled, allowDict = true, allowFsst = false)._1
    val w = new ByteWriter(nested.length + excIdx.size() * 6 + 16)
    w.putByte(F32_DEC); w.putVarInt(n); w.putByte(e); w.putVarInt(excIdx.size())
    var prev = 0
    i = 0
    while (i < excIdx.size()) {
      val idx = excIdx.get(i)
      w.putVarInt(idx - prev)
      prev = idx
      w.putIntLE(java.lang.Float.floatToRawIntBits(values(idx)))
      i += 1
    }
    w.putBytes(nested)
    Some(w.result())
  }

  // F64_PLAIN: [id][vlen n][n * raw IEEE-754 bits, int64 LE]
  private def encF64Plain(values: Array[Double]): Array[Byte] = {
    val w = new ByteWriter(values.length * 8 + 8)
    w.putByte(F64_PLAIN); w.putVarInt(values.length)
    var i = 0
    while (i < values.length) {
      val v = java.lang.Double.doubleToRawLongBits(values(i))
      w.putIntLE(v.toInt); w.putIntLE((v >>> 32).toInt)
      i += 1
    }
    w.result()
  }

  def decF64(in: ByteReader): Array[Double] = in.getByte() match {
    case F64_PLAIN =>
      val n = in.getVarInt()
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        val lo = in.getIntLE().toLong & 0xFFFFFFFFL
        val hi = in.getIntLE().toLong
        out(i) = java.lang.Double.longBitsToDouble((hi << 32) | lo)
        i += 1
      }
      out
    case F64_DEC =>
      val n = in.getVarInt()
      val e = in.getByte()
      val nExc = in.getVarInt()
      val excIdx = new Array[Int](nExc)
      val excVal = new Array[Double](nExc)
      var prev = 0
      var i = 0
      while (i < nExc) {
        prev += in.getVarInt()
        excIdx(i) = prev
        val lo = in.getIntLE().toLong & 0xFFFFFFFFL
        val hi = in.getIntLE().toLong
        excVal(i) = java.lang.Double.longBitsToDouble((hi << 32) | lo)
        i += 1
      }
      val scaled = LongBlocks.decodeReader(in)
      val p = Pow10(e)
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = scaled(i).toDouble / p; i += 1 }
      i = 0
      while (i < nExc) { out(excIdx(i)) = excVal(i); i += 1 }
      out
    case other => throw new IllegalArgumentException(s"not an f64 payload: id $other")
  }

  // F32_PLAIN: [id][vlen n][n * raw IEEE-754 bits, int32 LE]
  private def encF32Plain(values: Array[Float]): Array[Byte] = {
    val w = new ByteWriter(values.length * 4 + 8)
    w.putByte(F32_PLAIN); w.putVarInt(values.length)
    var i = 0
    while (i < values.length) {
      w.putIntLE(java.lang.Float.floatToRawIntBits(values(i)))
      i += 1
    }
    w.result()
  }

  def decF32(in: ByteReader): Array[Float] = in.getByte() match {
    case F32_PLAIN =>
      val n = in.getVarInt()
      val out = new Array[Float](n)
      var i = 0
      while (i < n) { out(i) = java.lang.Float.intBitsToFloat(in.getIntLE()); i += 1 }
      out
    case F32_DEC =>
      val n = in.getVarInt()
      val e = in.getByte()
      val nExc = in.getVarInt()
      val excIdx = new Array[Int](nExc)
      val excVal = new Array[Float](nExc)
      var prev = 0
      var i = 0
      while (i < nExc) {
        prev += in.getVarInt()
        excIdx(i) = prev
        excVal(i) = java.lang.Float.intBitsToFloat(in.getIntLE())
        i += 1
      }
      val scaled = IntBlocks.decodeReader(in)
      val p = Pow10(e)
      val out = new Array[Float](n)
      i = 0
      while (i < n) { out(i) = (scaled(i).toDouble / p).toFloat; i += 1 }
      i = 0
      while (i < nExc) { out(excIdx(i)) = excVal(i); i += 1 }
      out
    case other => throw new IllegalArgumentException(s"not an f32 payload: id $other")
  }

  // BIN_PLAIN: [id][vlen n][(vlen byteLen, bytes)*]
  def encBin(values: Array[Array[Byte]]): Array[Byte] = {
    var total = 8
    var i = 0
    while (i < values.length) { total += values(i).length + 5; i += 1 }
    val w = new ByteWriter(total)
    w.putByte(BIN_PLAIN); w.putVarInt(values.length)
    i = 0
    while (i < values.length) {
      w.putVarInt(values(i).length); w.putBytes(values(i))
      i += 1
    }
    w.result()
  }

  def decBin(in: ByteReader): Array[Array[Byte]] = {
    require(in.getByte() == BIN_PLAIN, "not a binary payload")
    val n = in.getVarInt()
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val len = in.getVarInt()
      out(i) = java.util.Arrays.copyOfRange(in.buf, in.pos, in.pos + len)
      in.pos += len
      i += 1
    }
    out
  }

  // NULLABLE: [id][vlen n][presence bitmap ceil(n/8), bit i set = present]
  //           [inner payload over the present values]
  def wrapNullable(n: Int, present: Array[Boolean], inner: Array[Byte]): Array[Byte] = {
    val w = new ByteWriter(inner.length + n / 8 + 8)
    w.putByte(NULLABLE); w.putVarInt(n)
    var i = 0
    var acc = 0
    while (i < n) {
      if (present(i)) acc |= 1 << (i & 7)
      if ((i & 7) == 7) { w.putByte(acc); acc = 0 }
      i += 1
    }
    if ((n & 7) != 0) w.putByte(acc)
    w.putBytes(inner)
    w.result()
  }

  /** (count, presence bitmap, reader positioned at the inner payload). */
  def unwrapNullable(in: ByteReader): (Int, Array[Boolean]) = {
    require(in.getByte() == NULLABLE, "not a nullable payload")
    val n = in.getVarInt()
    val present = new Array[Boolean](n)
    var i = 0
    var acc = 0
    while (i < n) {
      if ((i & 7) == 0) acc = in.getByte()
      present(i) = (acc & (1 << (i & 7))) != 0
      i += 1
    }
    (n, present)
  }

  // ARR: [id][lengths payload (IntBlocks)][flat values payload]
  def wrapArr(lengths: Array[Int], values: Array[Byte]): Array[Byte] = {
    val lens = IntBlocks.encodeAutoChoice(lengths, allowDict = false, allowFsst = false)._1
    val w = new ByteWriter(lens.length + values.length + 1)
    w.putByte(ARR); w.putBytes(lens); w.putBytes(values)
    w.result()
  }

  /** Lengths array; reader left positioned at the flat values payload. */
  def unwrapArr(in: ByteReader): Array[Int] = {
    require(in.getByte() == ARR, "not an array payload")
    IntBlocks.decodeReader(in)
  }

  /** Codec family name of ANY self-describing graft payload, wrappers
    * rendered as `nullable+inner` / `arr+values` (manifest evidence).
    */
  def codecName(bytes: Array[Byte]): String = codecName(new ByteReader(bytes))

  private def codecName(in: ByteReader): String = {
    val id = in.buf(in.pos) & 0xFF
    id match {
      case NULLABLE =>
        in.pos += 1
        val n = in.getVarInt()
        in.pos += (n + 7) / 8
        s"nullable+${codecName(in)}"
      case ARR =>
        in.pos += 1
        IntBlocks.decodeReader(in) // skip the lengths payload
        s"arr+${codecName(in)}"
      case _ =>
        IntBlocks.names.get(id).orElse(StrBlocks.names.get(id))
          .orElse(LongBlocks.names.get(id)).orElse(names.get(id))
          .getOrElse(throw new IllegalArgumentException(s"unknown codec id $id"))
    }
  }
}
