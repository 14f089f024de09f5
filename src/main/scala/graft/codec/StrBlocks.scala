package graft.codec

import java.nio.charset.StandardCharsets

/** Self-describing codecs over `Array[String]` (doc_id / source columns).
  * Ids live above 63 so int and string payloads are distinguishable.
  *
  * STR_NUMERIC handles canonical decimal strings (the common doc_id shape)
  * by delta-FOR over the parsed longs — round-trip-exact because
  * applicability requires `s == parsed.toString`. STR_DICT bottoms out into
  * [[IntBlocks]] for its code stream (cascade), so a sorted-by-source block
  * gets dict+RLE for free. STR_PLAIN is the lossless fallback.
  */
object StrBlocks {

  val STR_PLAIN = 64
  val STR_NUMERIC = 65
  val STR_DICT = 66

  val names: Map[Int, String] = Map(
    STR_PLAIN -> "str_plain", STR_NUMERIC -> "str_numeric", STR_DICT -> "str_dict")

  final case class Choice(id: Int, bytes: Int, candidateSizes: Map[String, Long]) {
    def name: String = names(id)
  }

  def encodeAuto(values: Array[String]): Array[Byte] = encodeAutoChoice(values)._1

  def encodeAutoChoice(values: Array[String]): (Array[Byte], Choice) = {
    val n = values.length
    var best: Array[Byte] = null
    var bestId = -1
    val sizes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def consider(id: Int, enc: => Option[Array[Byte]]): Unit = enc.foreach { e =>
      sizes(names(id)) = e.length.toLong
      if (best == null || e.length < best.length) { best = e; bestId = id }
    }
    consider(STR_PLAIN, Some(encPlain(values)))
    consider(STR_NUMERIC, encNumeric(values))
    if (n > 0) consider(STR_DICT, encDictStr(values))
    (best, Choice(bestId, best.length, sizes.toMap))
  }

  // STR_PLAIN: [id][vlen n][(vlen byteLen, utf8)*]
  private def encPlain(values: Array[String]): Array[Byte] = {
    val w = new ByteWriter(values.length * 8 + 16)
    w.putByte(STR_PLAIN); w.putVarInt(values.length)
    var i = 0
    while (i < values.length) {
      val b = values(i).getBytes(StandardCharsets.UTF_8)
      w.putVarInt(b.length); w.putBytes(b)
      i += 1
    }
    w.result()
  }

  /** Canonical non-negative decimal long (no leading zeros, <= 18 digits). */
  private def canonicalLong(s: String): Long = {
    val len = s.length
    if (len == 0 || len > 18) return -1L
    if (len > 1 && s.charAt(0) == '0') return -1L
    var v = 0L
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return -1L
      v = v * 10 + (c - '0')
      i += 1
    }
    v
  }

  // STR_NUMERIC: [id][vlen n][zz first][zz minDelta][width:1B][packed deltas]
  private def encNumeric(values: Array[String]): Option[Array[Byte]] = {
    val n = values.length
    val longs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = canonicalLong(values(i))
      if (v < 0) return None
      longs(i) = v
      i += 1
    }
    val w = new ByteWriter(n + 16)
    w.putByte(STR_NUMERIC); w.putVarInt(n)
    if (n == 0) return Some(w.result())
    w.putZigZagLong(longs(0))
    if (n == 1) return Some(w.result())
    var minD = Long.MaxValue
    var maxD = Long.MinValue
    val deltas = new Array[Long](n - 1)
    i = 1
    while (i < n) {
      val d = longs(i) - longs(i - 1) // values < 10^18, no overflow
      deltas(i - 1) = d
      if (d < minD) minD = d
      if (d > maxD) maxD = d
      i += 1
    }
    val range = maxD - minD
    if (range < 0) return None // paranoid overflow guard
    val width = BitPack.bits(range)
    if (width > 63) return None
    w.putZigZagLong(minD); w.putByte(width)
    i = 0
    while (i < n - 1) { deltas(i) -= minD; i += 1 }
    BitPack.pack(deltas, n - 1, width, w)
    Some(w.result())
  }

  // STR_DICT: [id][vlen n][vlen D][(vlen len, utf8)* sorted][nested int payload of codes]
  private def encDictStr(values: Array[String]): Option[Array[Byte]] = {
    val set = new java.util.TreeSet[String]()
    var i = 0
    while (i < values.length) {
      set.add(values(i))
      if (set.size > IntBlocks.DictCap) return None
      i += 1
    }
    val dict = set.toArray(new Array[String](set.size))
    val idx = new java.util.HashMap[String, Integer](dict.length * 2)
    i = 0
    while (i < dict.length) { idx.put(dict(i), i); i += 1 }
    val codes = new Array[Int](values.length)
    i = 0
    while (i < values.length) { codes(i) = idx.get(values(i)); i += 1 }
    val w = new ByteWriter(values.length + 64)
    w.putByte(STR_DICT); w.putVarInt(values.length)
    w.putVarInt(dict.length)
    i = 0
    while (i < dict.length) {
      val b = dict(i).getBytes(StandardCharsets.UTF_8)
      w.putVarInt(b.length); w.putBytes(b)
      i += 1
    }
    w.putBytes(IntBlocks.encodeAutoChoice(codes, allowDict = false, allowFsst = false)._1)
    Some(w.result())
  }

  def decode(bytes: Array[Byte]): Array[String] = decodeReader(new ByteReader(bytes))

  def decodeReader(in: ByteReader): Array[String] = {
    val id = in.getByte()
    id match {
      case STR_PLAIN =>
        val n = in.getVarInt()
        val out = new Array[String](n)
        var i = 0
        while (i < n) {
          val len = in.getVarInt()
          out(i) = new String(in.buf, in.pos, len, StandardCharsets.UTF_8)
          in.pos += len
          i += 1
        }
        out

      case STR_NUMERIC =>
        val n = in.getVarInt()
        val out = new Array[String](n)
        if (n == 0) return out
        var prev = in.getZigZagLong()
        out(0) = prev.toString
        if (n == 1) return out
        val minD = in.getZigZagLong()
        val width = in.getByte()
        val packed = BitPack.unpack(in, n - 1, width)
        var i = 1
        while (i < n) {
          prev = prev + packed(i - 1) + minD
          out(i) = prev.toString
          i += 1
        }
        out

      case STR_DICT =>
        val n = in.getVarInt()
        val d = in.getVarInt()
        val dict = new Array[String](d)
        var i = 0
        while (i < d) {
          val len = in.getVarInt()
          dict(i) = new String(in.buf, in.pos, len, StandardCharsets.UTF_8)
          in.pos += len
          i += 1
        }
        val codes = IntBlocks.decodeReader(in)
        val out = new Array[String](n)
        i = 0
        while (i < n) { out(i) = dict(codes(i)); i += 1 }
        out

      case other => throw new IllegalArgumentException(s"unknown string codec id $other")
    }
  }

  /** Dictionary-section hash for the manifest (mirrors IntBlocks). */
  def dictSectionHash(bytes: Array[Byte]): String = {
    val in = new ByteReader(bytes)
    val id = in.getByte()
    if (id == STR_DICT) {
      in.getVarInt() // n
      val start = in.pos
      val d = in.getVarInt()
      var i = 0
      while (i < d) { val len = in.getVarInt(); in.pos += len; i += 1 }
      Hashing.sha256Hex(bytes, start, in.pos - start)
    } else Hashing.sha256Hex(bytes)
  }
}
