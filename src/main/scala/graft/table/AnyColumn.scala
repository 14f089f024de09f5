package graft.table

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.codec.{ByteReader, IntBlocks, LongBlocks, PrimBlocks, StrBlocks}

/** Type-dispatched column codec for the generic (any-schema) table: maps a
  * storage kind to the codec family that encodes it, converting between the
  * three value representations involved —
  *   - ENCODE reads external Row values (boxed primitives, String, Seq);
  *   - payloads are the self-describing codec bytes (IntBlocks / LongBlocks
  *     / StrBlocks / PrimBlocks, NULLABLE-wrapped when the column slice
  *     contains nulls);
  *   - DECODE produces Catalyst-internal values (UTF8String, ArrayData) so
  *     the decode expression stays inside whole-stage codegen.
  *
  * Storage kinds are the NORMALIZED leaf types (GenericTable casts
  * byte/short/bool/date/timestamp columns to int/long storage and restores
  * them on decode): int, long, string, f64, f32, bin, arr_int, arr_long,
  * arr_str.
  */
object AnyColumn {

  /** Array kinds come in two element-nullability flavors: the plain kind
    * promises no null ELEMENTS (schema containsNull = false); the `_n`
    * variant stores a NULLABLE-wrapped flat stream and declares a
    * null-tolerant Catalyst type. Two kinds (not a runtime flag) because
    * the decode expression's dataType must be fixed at plan time and a
    * Catalyst cast can never relax containsNull true→false.
    */
  val Kinds: Set[String] =
    Set("int", "long", "string", "f64", "f32", "bin",
      "arr_int", "arr_long", "arr_str", "arr_f32", "arr_f64", "arr_bin",
      "arr_int_n", "arr_long_n", "arr_str_n", "arr_f32_n", "arr_f64_n",
      "arr_bin_n")

  /** (base kind, element-nullable?) of an array kind; identity otherwise. */
  private def baseOf(kind: String): (String, Boolean) =
    if (kind.startsWith("arr_") && kind.endsWith("_n")) (kind.dropRight(2), true)
    else (kind, false)

  def storageType(kind: String): DataType = {
    val (base, elemNullable) = baseOf(kind)
    base match {
      case "int" => IntegerType
      case "long" => LongType
      case "string" => StringType
      case "f64" => DoubleType
      case "f32" => FloatType
      case "bin" => BinaryType
      case "arr_int" => ArrayType(IntegerType, containsNull = elemNullable)
      case "arr_long" => ArrayType(LongType, containsNull = elemNullable)
      case "arr_str" => ArrayType(StringType, containsNull = elemNullable)
      case "arr_bin" => ArrayType(BinaryType, containsNull = elemNullable)
      case "arr_f32" => ArrayType(FloatType, containsNull = elemNullable)
      case "arr_f64" => ArrayType(DoubleType, containsNull = elemNullable)
      case other => throw new IllegalArgumentException(s"unknown storage kind $other")
    }
  }

  // ---------------------------------------------------------------- encode

  /** Encode one block's column slice from external Row values. Nulls get a
    * NULLABLE presence-bitmap wrapper around the dense payload.
    */
  def encodeColumn(kind: String, values: scala.collection.IndexedSeq[Any]): Array[Byte] = {
    val n = values.length
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { if (values(i) == null) hasNull = true; i += 1 }
    if (!hasNull) encodeDense(kind, values)
    else {
      val present = new Array[Boolean](n)
      val dense = IndexedSeq.newBuilder[Any]
      i = 0
      while (i < n) {
        if (values(i) != null) { present(i) = true; dense += values(i) }
        i += 1
      }
      PrimBlocks.wrapNullable(n, present, encodeDense(kind, dense.result()))
    }
  }

  private def seqOf[T](v: Any): scala.collection.Seq[T] =
    v.asInstanceOf[scala.collection.Seq[T]]

  /** Row lengths + the concatenated element stream of an array column. */
  private def flattenArr(values: scala.collection.IndexedSeq[Any]): (Array[Int], IndexedSeq[Any]) = {
    val n = values.length
    val lens = new Array[Int](n)
    val flat = IndexedSeq.newBuilder[Any]
    var i = 0
    while (i < n) {
      val s = seqOf[Any](values(i))
      lens(i) = s.length
      flat ++= s
      i += 1
    }
    (lens, flat.result())
  }

  /** Flat-stream payload: when any ELEMENT is null (legal only for `_n`
    * kinds), the dense payload gets the same NULLABLE presence-bitmap
    * wrapper used for column-level nulls; element-null-free streams pay
    * nothing.
    */
  private def encodeFlatPayload(
      flat: IndexedSeq[Any], encDense: IndexedSeq[Any] => Array[Byte]): Array[Byte] = {
    val n = flat.length
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { if (flat(i) == null) hasNull = true; i += 1 }
    if (!hasNull) encDense(flat)
    else {
      val present = new Array[Boolean](n)
      val dense = IndexedSeq.newBuilder[Any]
      i = 0
      while (i < n) {
        if (flat(i) != null) { present(i) = true; dense += flat(i) }
        i += 1
      }
      PrimBlocks.wrapNullable(n, present, encDense(dense.result()))
    }
  }

  private def toInts(d: IndexedSeq[Any]): Array[Int] = {
    val a = new Array[Int](d.length)
    var i = 0
    while (i < d.length) { a(i) = d(i).asInstanceOf[Int]; i += 1 }
    a
  }

  private def toLongs(d: IndexedSeq[Any]): Array[Long] = {
    val a = new Array[Long](d.length)
    var i = 0
    while (i < d.length) { a(i) = d(i).asInstanceOf[Long]; i += 1 }
    a
  }

  private def toFloats(d: IndexedSeq[Any]): Array[Float] = {
    val a = new Array[Float](d.length)
    var i = 0
    while (i < d.length) { a(i) = d(i).asInstanceOf[Float]; i += 1 }
    a
  }

  private def toDoubles(d: IndexedSeq[Any]): Array[Double] = {
    val a = new Array[Double](d.length)
    var i = 0
    while (i < d.length) { a(i) = d(i).asInstanceOf[Double]; i += 1 }
    a
  }

  private def toStrings(d: IndexedSeq[Any]): Array[String] = {
    val a = new Array[String](d.length)
    var i = 0
    while (i < d.length) { a(i) = d(i).asInstanceOf[String]; i += 1 }
    a
  }

  private def toBins(d: IndexedSeq[Any]): Array[Array[Byte]] = {
    val a = new Array[Array[Byte]](d.length)
    var i = 0
    while (i < d.length) { a(i) = d(i).asInstanceOf[Array[Byte]]; i += 1 }
    a
  }

  private def encodeDense(kind: String, values0: scala.collection.IndexedSeq[Any]): Array[Byte] = {
    val values = values0
    val n = values.length
    kind match {
      case "int" =>
        val a = new Array[Int](n)
        var i = 0
        while (i < n) { a(i) = values(i).asInstanceOf[Int]; i += 1 }
        IntBlocks.encodeAuto(a)
      case "long" =>
        val a = new Array[Long](n)
        var i = 0
        while (i < n) { a(i) = values(i).asInstanceOf[Long]; i += 1 }
        LongBlocks.encodeAuto(a)
      case "string" =>
        val a = new Array[String](n)
        var i = 0
        while (i < n) { a(i) = values(i).asInstanceOf[String]; i += 1 }
        StrBlocks.encodeAuto(a)
      case "f64" =>
        val a = new Array[Double](n)
        var i = 0
        while (i < n) { a(i) = values(i).asInstanceOf[Double]; i += 1 }
        PrimBlocks.encF64(a)
      case "f32" =>
        val a = new Array[Float](n)
        var i = 0
        while (i < n) { a(i) = values(i).asInstanceOf[Float]; i += 1 }
        PrimBlocks.encF32(a)
      case "bin" =>
        val a = new Array[Array[Byte]](n)
        var i = 0
        while (i < n) { a(i) = values(i).asInstanceOf[Array[Byte]]; i += 1 }
        PrimBlocks.encBin(a)
      case arr if arr.startsWith("arr_") =>
        val (base, elemNullable) = baseOf(arr)
        val (lens, flat) = flattenArr(values)
        if (!elemNullable) {
          var i = 0
          while (i < flat.length) {
            require(flat(i) != null,
              s"null array element in a $arr column (schema said containsNull=false)")
            i += 1
          }
        }
        val inner = encodeFlatPayload(flat, base match {
          case "arr_int" => d => IntBlocks.encodeAuto(toInts(d))
          case "arr_long" => d => LongBlocks.encodeAuto(toLongs(d))
          case "arr_str" => d => StrBlocks.encodeAuto(toStrings(d))
          case "arr_bin" => d => PrimBlocks.encBin(toBins(d))
          case "arr_f32" => d => PrimBlocks.encF32(toFloats(d))
          case "arr_f64" => d => PrimBlocks.encF64(toDoubles(d))
        })
        PrimBlocks.wrapArr(lens, inner)
      case other => throw new IllegalArgumentException(s"unknown storage kind $other")
    }
  }

  /** Nominal uncompressed bytes of one value (metrics / compression-vs-plain
    * accounting, mirroring the token path's plain_bytes rule).
    */
  def plainBytesOf(kind: String, v: Any): Long =
    if (v == null) 1L
    else baseOf(kind)._1 match {
      case "int" | "f32" => 4L
      case "long" | "f64" => 8L
      case "string" => v.asInstanceOf[String].length.toLong
      case "bin" => v.asInstanceOf[Array[Byte]].length.toLong
      case "arr_int" | "arr_f32" => 4L + 4L * seqOf[Any](v).length
      case "arr_long" | "arr_f64" => 4L + 8L * seqOf[Any](v).length
      case "arr_str" =>
        4L + seqOf[String](v).foldLeft(0L)((a, s) => a + (if (s == null) 1 else s.length))
      case "arr_bin" =>
        4L + seqOf[Array[Byte]](v).foldLeft(0L)((a, b) => a + (if (b == null) 1 else b.length))
      case other => throw new IllegalArgumentException(s"unknown storage kind $other")
    }

  // ---------------------------------------------------------------- decode

  /** Decode a column payload to Catalyst-internal values (null entries where
    * the presence bitmap says so). Called from the GraftDecodeAny codegen.
    */
  def decodeCatalyst(kind: String, bytes: Array[Byte]): GenericArrayData = {
    val in = new ByteReader(bytes)
    val out =
      if ((bytes(0) & 0xFF) == PrimBlocks.NULLABLE) {
        val (n, present) = PrimBlocks.unwrapNullable(in)
        val dense = decodeDense(kind, in)
        val scattered = new Array[Any](n)
        var i = 0
        var j = 0
        while (i < n) {
          if (present(i)) { scattered(i) = dense(j); j += 1 }
          i += 1
        }
        scattered
      } else decodeDense(kind, in)
    new GenericArrayData(out)
  }

  /** Scatter a NULLABLE-wrapped flat element stream back to full length. */
  private def decodeNullableFlat(
      in: ByteReader, dec: ByteReader => Array[Any]): Array[Any] = {
    val (n, present) = PrimBlocks.unwrapNullable(in)
    val dense = dec(in)
    val out = new Array[Any](n)
    var i = 0
    var j = 0
    while (i < n) {
      if (present(i)) { out(i) = dense(j); j += 1 }
      i += 1
    }
    out
  }

  private def decodeDense(kind: String, in: ByteReader): Array[Any] = baseOf(kind)._1 match {
    case "int" =>
      IntBlocks.decodeReader(in).map(Int.box(_): Any)
    case "long" =>
      LongBlocks.decodeReader(in).map(Long.box(_): Any)
    case "string" =>
      StrBlocks.decodeReader(in).map(UTF8String.fromString(_): Any)
    case "f64" =>
      PrimBlocks.decF64(in).map(Double.box(_): Any)
    case "f32" =>
      PrimBlocks.decF32(in).map(Float.box(_): Any)
    case "bin" =>
      PrimBlocks.decBin(in).map(b => b: Any)
    case base if base.startsWith("arr_") =>
      val lens = PrimBlocks.unwrapArr(in)
      val boxDec: ByteReader => Array[Any] = base match {
        case "arr_int" => r => IntBlocks.decodeReader(r).map(Int.box(_): Any)
        case "arr_long" => r => LongBlocks.decodeReader(r).map(Long.box(_): Any)
        case "arr_str" => r => StrBlocks.decodeReader(r).map(UTF8String.fromString(_): Any)
        case "arr_bin" => r => PrimBlocks.decBin(r).map(b => b: Any)
        case "arr_f32" => r => PrimBlocks.decF32(r).map(Float.box(_): Any)
        case "arr_f64" => r => PrimBlocks.decF64(r).map(Double.box(_): Any)
      }
      if ((in.buf(in.pos) & 0xFF) == PrimBlocks.NULLABLE) {
        // element nulls present (an `_n` kind's stream): boxed slices
        val flat = decodeNullableFlat(in, boxDec).asInstanceOf[Array[AnyRef]]
        sliceArrays(lens)(from => to =>
          new GenericArrayData(java.util.Arrays.copyOfRange(flat, from, to)
            .asInstanceOf[Array[Any]]))
      } else base match {
        // dense fast paths stay primitive (UnsafeArrayData, no boxing)
        case "arr_int" =>
          val flat = IntBlocks.decodeReader(in)
          sliceArrays(lens)(from => to =>
            UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOfRange(flat, from, to)))
        case "arr_long" =>
          val flat = LongBlocks.decodeReader(in)
          sliceArrays(lens)(from => to =>
            UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOfRange(flat, from, to)))
        case "arr_str" =>
          val flat = StrBlocks.decodeReader(in)
          sliceArrays(lens)(from => to =>
            new GenericArrayData(java.util.Arrays.copyOfRange(flat, from, to)
              .map(UTF8String.fromString(_): Any)))
        case "arr_bin" =>
          val flat = PrimBlocks.decBin(in)
          sliceArrays(lens)(from => to =>
            new GenericArrayData(java.util.Arrays.copyOfRange(flat, from, to)
              .asInstanceOf[Array[Any]]))
        case "arr_f32" =>
          val flat = PrimBlocks.decF32(in)
          sliceArrays(lens)(from => to =>
            UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOfRange(flat, from, to)))
        case "arr_f64" =>
          val flat = PrimBlocks.decF64(in)
          sliceArrays(lens)(from => to =>
            UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOfRange(flat, from, to)))
      }
    case other => throw new IllegalArgumentException(s"unknown storage kind $other")
  }

  private def sliceArrays(lens: Array[Int])(mk: Int => Int => Any): Array[Any] = {
    val out = new Array[Any](lens.length)
    var off = 0
    var i = 0
    while (i < lens.length) {
      out(i) = mk(off)(off + lens(i))
      off += lens(i)
      i += 1
    }
    out
  }
}
