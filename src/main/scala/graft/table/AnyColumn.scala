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

  val Kinds: Set[String] =
    Set("int", "long", "string", "f64", "f32", "bin",
      "arr_int", "arr_long", "arr_str", "arr_f32", "arr_f64")

  def storageType(kind: String): DataType = kind match {
    case "int" => IntegerType
    case "long" => LongType
    case "string" => StringType
    case "f64" => DoubleType
    case "f32" => FloatType
    case "bin" => BinaryType
    case "arr_int" => ArrayType(IntegerType, containsNull = false)
    case "arr_long" => ArrayType(LongType, containsNull = false)
    case "arr_str" => ArrayType(StringType, containsNull = false)
    case "arr_f32" => ArrayType(FloatType, containsNull = false)
    case "arr_f64" => ArrayType(DoubleType, containsNull = false)
    case other => throw new IllegalArgumentException(s"unknown storage kind $other")
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

  private def encodeDense(kind: String, values: scala.collection.IndexedSeq[Any]): Array[Byte] = {
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
      case "arr_int" =>
        val lens = new Array[Int](n)
        var total = 0
        var i = 0
        while (i < n) { lens(i) = seqOf[Int](values(i)).length; total += lens(i); i += 1 }
        val flat = new Array[Int](total)
        var off = 0
        i = 0
        while (i < n) {
          val s = seqOf[Int](values(i))
          var j = 0
          while (j < lens(i)) { flat(off) = s(j); off += 1; j += 1 }
          i += 1
        }
        PrimBlocks.wrapArr(lens, IntBlocks.encodeAuto(flat))
      case "arr_long" =>
        val lens = new Array[Int](n)
        var total = 0
        var i = 0
        while (i < n) { lens(i) = seqOf[Long](values(i)).length; total += lens(i); i += 1 }
        val flat = new Array[Long](total)
        var off = 0
        i = 0
        while (i < n) {
          val s = seqOf[Long](values(i))
          var j = 0
          while (j < lens(i)) { flat(off) = s(j); off += 1; j += 1 }
          i += 1
        }
        PrimBlocks.wrapArr(lens, LongBlocks.encodeAuto(flat))
      case "arr_str" =>
        val lens = new Array[Int](n)
        var total = 0
        var i = 0
        while (i < n) { lens(i) = seqOf[String](values(i)).length; total += lens(i); i += 1 }
        val flat = new Array[String](total)
        var off = 0
        i = 0
        while (i < n) {
          val s = seqOf[String](values(i))
          var j = 0
          while (j < lens(i)) { flat(off) = s(j); off += 1; j += 1 }
          i += 1
        }
        PrimBlocks.wrapArr(lens, StrBlocks.encodeAuto(flat))
      case "arr_f32" =>
        val lens = new Array[Int](n)
        var total = 0
        var i = 0
        while (i < n) { lens(i) = seqOf[Float](values(i)).length; total += lens(i); i += 1 }
        val flat = new Array[Float](total)
        var off = 0
        i = 0
        while (i < n) {
          val s = seqOf[Float](values(i))
          var j = 0
          while (j < lens(i)) { flat(off) = s(j); off += 1; j += 1 }
          i += 1
        }
        PrimBlocks.wrapArr(lens, PrimBlocks.encF32(flat))
      case "arr_f64" =>
        val lens = new Array[Int](n)
        var total = 0
        var i = 0
        while (i < n) { lens(i) = seqOf[Double](values(i)).length; total += lens(i); i += 1 }
        val flat = new Array[Double](total)
        var off = 0
        i = 0
        while (i < n) {
          val s = seqOf[Double](values(i))
          var j = 0
          while (j < lens(i)) { flat(off) = s(j); off += 1; j += 1 }
          i += 1
        }
        PrimBlocks.wrapArr(lens, PrimBlocks.encF64(flat))
      case other => throw new IllegalArgumentException(s"unknown storage kind $other")
    }
  }

  /** Nominal uncompressed bytes of one value (metrics / compression-vs-plain
    * accounting, mirroring the token path's plain_bytes rule).
    */
  def plainBytesOf(kind: String, v: Any): Long =
    if (v == null) 1L
    else kind match {
      case "int" | "f32" => 4L
      case "long" | "f64" => 8L
      case "string" => v.asInstanceOf[String].length.toLong
      case "bin" => v.asInstanceOf[Array[Byte]].length.toLong
      case "arr_int" => 4L + 4L * seqOf[Int](v).length
      case "arr_long" => 4L + 8L * seqOf[Long](v).length
      case "arr_str" =>
        4L + seqOf[String](v).foldLeft(0L)(_ + _.length)
      case "arr_f32" => 4L + 4L * seqOf[Float](v).length
      case "arr_f64" => 4L + 8L * seqOf[Double](v).length
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

  private def decodeDense(kind: String, in: ByteReader): Array[Any] = kind match {
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
    case "arr_int" =>
      val lens = PrimBlocks.unwrapArr(in)
      val flat = IntBlocks.decodeReader(in)
      sliceArrays(lens)(from => to =>
        UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOfRange(flat, from, to)))
    case "arr_long" =>
      val lens = PrimBlocks.unwrapArr(in)
      val flat = LongBlocks.decodeReader(in)
      sliceArrays(lens)(from => to =>
        UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOfRange(flat, from, to)))
    case "arr_str" =>
      val lens = PrimBlocks.unwrapArr(in)
      val flat = StrBlocks.decodeReader(in)
      sliceArrays(lens)(from => to =>
        new GenericArrayData(java.util.Arrays.copyOfRange(flat, from, to)
          .map(UTF8String.fromString(_): Any)))
    case "arr_f32" =>
      val lens = PrimBlocks.unwrapArr(in)
      val flat = PrimBlocks.decF32(in)
      sliceArrays(lens)(from => to =>
        UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOfRange(flat, from, to)))
    case "arr_f64" =>
      val lens = PrimBlocks.unwrapArr(in)
      val flat = PrimBlocks.decF64(in)
      sliceArrays(lens)(from => to =>
        UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOfRange(flat, from, to)))
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
