package graft.table

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property test over RANDOM schemas drawn from the generic lane's full
  * supported grammar (the ebenezer arbitrary-thrift-struct analogue, but
  * for the whole type system): build a random StructType + random data
  * (nulls everywhere they are legal), encode, decode, and require exact
  * row equality. Every shape the encoder claims — scalars, temporals,
  * decimals narrow AND wide, binary, scalar arrays, temporal/decimal
  * arrays, list<struct>, maps with struct values, nested structs — can
  * appear in any combination.
  */
class GenericArbitrarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-arb-$tag").toString

  // ---- type generator (the supported grammar) ----

  private def genScalar(rnd: Random): DataType = rnd.nextInt(14) match {
    case 0 => IntegerType
    case 1 => LongType
    case 2 => StringType
    case 3 => DoubleType
    case 4 => FloatType
    case 5 => ByteType
    case 6 => ShortType
    case 7 => BooleanType
    case 8 => DateType
    case 9 => TimestampType
    case 10 => TimestampNTZType
    case 11 => // narrow decimal
      val s = rnd.nextInt(19); val p = s + 1 + rnd.nextInt(18 - s + 1)
      DecimalType(math.min(p, 18), math.min(s, math.min(p, 18)))
    case 12 => // wide decimal
      val p = 19 + rnd.nextInt(20); val s = rnd.nextInt(p + 1)
      DecimalType(p, s)
    case 13 => BinaryType
  }

  /** Scalars the ARRAY element position supports (everything but binary). */
  private def genElem(rnd: Random): DataType = {
    var t = genScalar(rnd)
    while (t == BinaryType) t = genScalar(rnd)
    t
  }

  /** Map keys: scalars, structs of scalars, or scalar arrays — anything
    * with a total equality (no maps anywhere, per the encoder's reject;
    * no binary — keys ride array legs).
    */
  private def genKeyT(rnd: Random, depth: Int): DataType = rnd.nextInt(5) match {
    case 0 if depth > 0 =>
      StructType((0 until 1 + rnd.nextInt(2)).map(i =>
        StructField(s"k$i", genElem(rnd), nullable = rnd.nextBoolean())))
    case 1 if depth > 0 => ArrayType(genElem(rnd), containsNull = false)
    case _ =>
      Seq(IntegerType, LongType, StringType, FloatType, DoubleType)(rnd.nextInt(5))
  }

  /** Types legal under an array/map shredding position: the full grammar
    * including binary (arr_bin legs) — only map KEYS stay binary-free
    * (byte-array equality is reference-based in the external Scala Map).
    */
  private def genArrayable(rnd: Random, depth: Int): DataType = rnd.nextInt(7) match {
    case 1 if depth > 0 =>
      ArrayType(genArrayable(rnd, depth - 1), containsNull = rnd.nextBoolean())
    case 2 if depth > 0 =>
      StructType((0 until 1 + rnd.nextInt(3)).map(i =>
        StructField(s"g$i", genArrayable(rnd, depth - 1), nullable = rnd.nextBoolean())))
    case 3 if depth > 0 =>
      MapType(genKeyT(rnd, depth - 1), genArrayable(rnd, depth - 1),
        valueContainsNull = rnd.nextBoolean())
    case 4 => BinaryType
    case _ => genElem(rnd)
  }

  private def genField(rnd: Random, depth: Int): DataType = rnd.nextInt(8) match {
    case 0 => genScalar(rnd) // binary legal here (scalar / struct-field position)
    case 1 => ArrayType(genElem(rnd), containsNull = rnd.nextBoolean())
    case 2 => // list<struct> whose fields draw from the full arrayable grammar
      ArrayType(
        StructType((0 until 1 + rnd.nextInt(3)).map(i =>
          StructField(s"f$i", genArrayable(rnd, depth), nullable = rnd.nextBoolean()))),
        containsNull = rnd.nextBoolean())
    case 3 =>
      MapType(genKeyT(rnd, depth), genArrayable(rnd, depth),
        valueContainsNull = rnd.nextBoolean())
    case 4 if depth > 0 =>
      StructType((0 until 1 + rnd.nextInt(3)).map(i =>
        StructField(s"n$i", genField(rnd, depth - 1), nullable = rnd.nextBoolean())))
    case 5 => // nested repetition to arbitrary depth: list<list<ANY arrayable>>
      ArrayType(
        ArrayType(genArrayable(rnd, depth), containsNull = rnd.nextBoolean()),
        containsNull = rnd.nextBoolean())
    case 6 => ArrayType(genArrayable(rnd, depth), containsNull = rnd.nextBoolean())
    case _ => genScalar(rnd)
  }

  private def genSchema(rnd: Random): StructType =
    StructType(
      StructField("id", LongType, nullable = false) +:
        (0 until 2 + rnd.nextInt(4)).map(i =>
          StructField(s"c$i", genField(rnd, depth = 2), nullable = true)))

  // ---- data generator (external row types) ----

  private def genValue(
      rnd: Random, dt: DataType, nullable: Boolean, keySafe: Boolean = false): Any = {
    if (nullable && rnd.nextInt(5) == 0) return null
    dt match {
      case IntegerType => rnd.nextInt()
      case LongType => rnd.nextLong()
      case StringType =>
        val n = rnd.nextInt(12)
        (0 until n).map(_ => "abπé中 xyz".charAt(rnd.nextInt(9))).mkString
      case DoubleType =>
        // no NaN under a map KEY: two NaNs are distinct to Scala's == (the
        // external Map keeps both) but Spark normalizes map keys and
        // rejects the duplicate — Spark itself cannot build such a map
        if (!keySafe && rnd.nextInt(20) == 0) Double.NaN
        else rnd.nextDouble() * 1e6 - 5e5
      case FloatType =>
        if (rnd.nextInt(20) == 0) Float.PositiveInfinity
        else rnd.nextFloat() * 1e4f - 5e3f
      case ByteType => rnd.nextInt().toByte
      case ShortType => rnd.nextInt().toShort
      case BooleanType => rnd.nextBoolean()
      case DateType => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(rnd.nextInt(40000) - 5000L))
      case TimestampType =>
        val micros = rnd.nextLong() % 4102444800000000L // within +/- ~130y
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
      case TimestampNTZType =>
        val micros = rnd.nextLong() % 4102444800000000L
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case d: DecimalType =>
        val digits = 1 + rnd.nextInt(d.precision)
        val unscaled = new java.math.BigInteger(
          (0 until digits).map(_ => ('0' + rnd.nextInt(10)).toChar).mkString
            .replaceAll("^0+(?=.)", "")
            .prepended(if (rnd.nextBoolean()) '-' else '+').mkString)
        new java.math.BigDecimal(unscaled, d.scale)
      case BinaryType => Array.fill[Byte](rnd.nextInt(10))(rnd.nextInt().toByte)
      case ArrayType(et, cn) =>
        (0 until rnd.nextInt(4)).map(_ => genValue(rnd, et, cn, keySafe))
      case MapType(kt, vt, vcn) =>
        (0 until rnd.nextInt(4)).map { _ =>
          genValue(rnd, kt, nullable = false, keySafe = true) ->
            genValue(rnd, vt, vcn, keySafe)
        }.toMap
      case st: StructType =>
        Row.fromSeq(st.fields.toIndexedSeq.map(f =>
          genValue(rnd, f.dataType, f.nullable, keySafe)))
      case other => throw new IllegalStateException(other.catalogString)
    }
  }

  /** Value-canonical rendering: binary by content (Row.toString would
    * print the array reference), maps sorted by rendered key (map order
    * is not part of map equality), floats by exact bit pattern.
    */
  private def canon(v: Any): String = v match {
    case null => "null"
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString("x'", "", "'")
    case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
    case f: Float => java.lang.Float.floatToRawIntBits(f).toString
    case r: Row => r.toSeq.map(canon).mkString("{", ",", "}")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => s"${canon(k)}->${canon(x)}" }
        .sorted.mkString("m[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case other => other.toString
  }

  test("random schemas from the full supported grammar round-trip exactly") {
    val seed = 20260817L
    (0 until 12).foreach { trial =>
      val rnd = new Random(seed + trial)
      val schema = genSchema(rnd)
      val rows = new java.util.ArrayList[Row]()
      (0 until 80).foreach { i =>
        rows.add(Row.fromSeq(i.toLong +: schema.fields.toIndexedSeq.tail.map(f =>
          genValue(rnd, f.dataType, f.nullable))))
      }
      val df = spark.createDataFrame(rows, schema)
      val dir = tmpDir(s"t$trial")
      try GenericTable.encode(df, dir, keyCol = "id",
        opts = GraftTable.Options(targetRowsPerBlock = 32))
      catch {
        case e: Throwable => throw new IllegalStateException(
          s"trial $trial encode failed for schema ${schema.catalogString}", e)
      }
      val want = df.orderBy("id").collect().map(canon)
      val dec = GenericTable.decode(spark, dir).orderBy("id").collect().map(canon)
      assert(dec.sameElements(want),
        s"trial $trial schema ${schema.catalogString}:\n" +
          dec.zip(want).filter(p => p._1 != p._2).take(3)
            .map(p => s"  got ${p._1}\n want ${p._2}").mkString("\n"))
      // the connector must assemble the identical rows
      val via = spark.read.format("graft").load(dir)
        .orderBy("id").collect().map(canon)
      assert(via.sameElements(want), s"trial $trial (DSv2) ${schema.catalogString}")
    }
  }

  test("random schemas survive append + schema evolution + compact") {
    val seed = 573202608L
    (0 until 6).foreach { trial =>
      val rnd = new Random(seed + trial)
      val merged = genSchema(rnd)
      // the first batch predates the LAST field (union-by-name evolution
      // appends it later; old rows must read null for it)
      val v1Schema = StructType(merged.fields.dropRight(1))
      def batch(schema: StructType, lo: Int, n: Int): org.apache.spark.sql.DataFrame = {
        val rows = new java.util.ArrayList[Row]()
        (lo until lo + n).foreach { i =>
          rows.add(Row.fromSeq(i.toLong +: schema.fields.toIndexedSeq.tail.map(f =>
            genValue(rnd, f.dataType, f.nullable))))
        }
        spark.createDataFrame(rows, schema)
      }
      val b1 = batch(v1Schema, 0, 60)
      val b2 = batch(merged, 60, 60)
      val b3 = batch(merged, 120, 60)
      val dir = tmpDir(s"evo$trial")
      val opts = GraftTable.Options(targetRowsPerBlock = 32)
      GenericTable.encode(b1, dir, keyCol = "id", opts)
      GenericTable.append(b2, dir, opts)
      GenericTable.append(b3, dir, opts)
      def expected: Array[String] = {
        val nulled = b1.withColumn(merged.fields.last.name,
          org.apache.spark.sql.functions.lit(null)
            .cast(merged.fields.last.dataType))
        (nulled.collect() ++ b2.collect() ++ b3.collect())
          .sortBy(_.getLong(0)).map(canon)
      }
      val want = expected
      def check(tag: String, got: Array[String]): Unit =
        assert(got.sameElements(want),
          s"trial $trial $tag ${merged.catalogString}:\n" +
            got.zip(want).filter(p => p._1 != p._2).take(2)
              .map(p => s"  got ${p._1}\n want ${p._2}").mkString("\n"))
      check("decode", GenericTable.decode(spark, dir)
        .orderBy("id").collect().map(canon))
      check("DSv2", spark.read.format("graft").load(dir)
        .orderBy("id").collect().map(canon))
      // compaction rewrites through decode→encode under the merged plan —
      // every value must survive the rewrite
      GenericTable.compact(spark, dir, opts)
      check("post-compact", GenericTable.decode(spark, dir)
        .orderBy("id").collect().map(canon))
      // key-range slice across the evolution boundary
      val slice = GenericTable.decodeRange(spark, dir, 40L, 80L)
        .orderBy("id").collect().map(canon)
      assert(slice.sameElements(want.slice(40, 81)), s"trial $trial range")
    }
  }
}
