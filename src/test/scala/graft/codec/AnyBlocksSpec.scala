package graft.codec

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip properties for the generic-table codec families (LongBlocks,
  * PrimBlocks) — the codec-level half of the any-schema guarantee; the
  * table-level half lives in GenericTableSpec. Generators are sampled with
  * fixed seeds (scalatestplus-scalacheck is not in the offline cache).
  */
class AnyBlocksSpec extends AnyFunSuite with SeededGens {

  private val longArrays: Gen[Array[Long]] = Gen.oneOf(
    // adversarial regimes: full-range (FOR/DELTA overflow paths), clustered,
    // low-cardinality (dict), constant runs (rle), sorted (delta)
    Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)),
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)),
    Gen.listOf(Gen.oneOf(1L, 2L, 3L, Long.MaxValue, Long.MinValue)),
    Gen.chooseNum(0, 200).flatMap(n => Gen.const(List.fill(n)(42L))),
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.sorted)
  ).map(_.toArray)

  test("LongBlocks auto round-trips every regime incl. 64-bit extremes") {
    samples(longArrays, 300).foreach { a =>
      val enc = LongBlocks.encodeAuto(a)
      assert(LongBlocks.decode(enc).sameElements(a))
      // self-describing: the id byte is a known long codec
      assert(LongBlocks.names.contains(enc(0) & 0xFF))
    }
    // explicit worst cases
    Seq(
      Array(Long.MinValue, Long.MaxValue, 0L, -1L, 1L),
      Array(Long.MinValue, Long.MinValue),
      Array.empty[Long],
      Array(Long.MaxValue)
    ).foreach(a => assert(LongBlocks.decode(LongBlocks.encodeAuto(a)).sameElements(a)))
  }

  test("LongBlocks picks compact codecs where expected") {
    val sorted = Array.tabulate(1000)(i => 1000000L + i * 3L)
    assert((LongBlocks.encodeAuto(sorted)(0) & 0xFF) == LongBlocks.L_DELTA_FOR)
    // constant arrays: FOR at width 0 (5 B) legitimately beats RLE (6 B)
    assert(LongBlocks.encodeAuto(Array.fill(1000)(7L)).length <= 6)
    // long runs of WIDE-range values: RLE wins (FOR would pack 60+ bits/slot)
    val runs = Array.tabulate(1000)(i => if (i < 500) 1L else 1L << 60)
    assert((LongBlocks.encodeAuto(runs)(0) & 0xFF) == LongBlocks.L_RLE)
    val fewDistinct = Array.tabulate(1000)(i => Array(5L, -99L, 1L << 60)(i % 3))
    val encoded = LongBlocks.encodeAuto(fewDistinct)
    assert(encoded.length < 1000, s"no compression: ${encoded.length}")
  }

  test("f64/f32 payloads preserve exact bit patterns (NaN payloads, -0.0, infs)") {
    val weird = Array(0.0, -0.0, Double.NaN,
      java.lang.Double.longBitsToDouble(0x7FF8000000000001L), // NaN payload
      Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, Double.MaxValue, 1.5e-300)
    val back = PrimBlocks.decF64(new ByteReader(PrimBlocks.encF64(weird)))
    weird.indices.foreach(i => assert(
      java.lang.Double.doubleToRawLongBits(weird(i)) ==
        java.lang.Double.doubleToRawLongBits(back(i)), s"at $i"))
    val weirdF = Array(0.0f, -0.0f, Float.NaN,
      java.lang.Float.intBitsToFloat(0x7FC00001),
      Float.PositiveInfinity, Float.MinPositiveValue)
    val backF = PrimBlocks.decF32(new ByteReader(PrimBlocks.encF32(weirdF)))
    weirdF.indices.foreach(i => assert(
      java.lang.Float.floatToRawIntBits(weirdF(i)) ==
        java.lang.Float.floatToRawIntBits(backF(i)), s"at $i"))
  }

  test("decimal doubles pick f64_dec, round-trip bit-exactly with exceptions") {
    // 2-decimal prices with scattered non-decimal values (the ALP shape)
    val rnd = new scala.util.Random(7)
    val prices = Array.tabulate(4096) { i =>
      if (i % 97 == 0) java.lang.Double.longBitsToDouble(rnd.nextLong()) // exception
      else (rnd.nextInt(900000) + 1) / 100.0
    }
    val enc = PrimBlocks.encF64(prices)
    assert((enc(0) & 0xFF) == PrimBlocks.F64_DEC)
    assert(enc.length < prices.length * 3, s"dec payload ${enc.length}B should beat 3B/value")
    val back = PrimBlocks.decF64(new ByteReader(enc))
    prices.indices.foreach(i => assert(
      java.lang.Double.doubleToRawLongBits(prices(i)) ==
        java.lang.Double.doubleToRawLongBits(back(i)), s"at $i"))
    // integral doubles (quantities) scale at e=0 and ride LongBlocks FOR
    val qty = Array.tabulate(2048)(i => (i % 50 + 1).toDouble)
    val encQ = PrimBlocks.encF64(qty)
    assert((encQ(0) & 0xFF) == PrimBlocks.F64_DEC)
    assert(encQ.length < qty.length * 2)
    // random mantissas stay raw: no false positives from the sampler
    val noise = Array.fill(2048)(java.lang.Double.longBitsToDouble(rnd.nextLong()))
    assert((PrimBlocks.encF64(noise)(0) & 0xFF) == PrimBlocks.F64_PLAIN)
  }

  test("decimal floats pick f32_dec and round-trip bit-exactly") {
    val rnd = new scala.util.Random(11)
    val vals = Array.tabulate(4096) { i =>
      if (i % 113 == 0) java.lang.Float.intBitsToFloat(rnd.nextInt())
      else (rnd.nextInt(10000) - 5000) / 10.0f
    }
    val enc = PrimBlocks.encF32(vals)
    assert((enc(0) & 0xFF) == PrimBlocks.F32_DEC)
    val back = PrimBlocks.decF32(new ByteReader(enc))
    vals.indices.foreach(i => assert(
      java.lang.Float.floatToRawIntBits(vals(i)) ==
        java.lang.Float.floatToRawIntBits(back(i)), s"at $i"))
    val noiseF = Array.fill(2048)(java.lang.Float.intBitsToFloat(rnd.nextInt()))
    assert((PrimBlocks.encF32(noiseF)(0) & 0xFF) == PrimBlocks.F32_PLAIN)
  }

  test("f64/f32 property: any value mix round-trips bit-exactly under auto") {
    val genD = Gen.oneOf(
      Gen.chooseNum(-1000000, 1000000).map(_ / 100.0),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(java.lang.Double.longBitsToDouble))
    samples(Gen.listOf(genD), 200).foreach { vs =>
      val a = vs.toArray
      val back = PrimBlocks.decF64(new ByteReader(PrimBlocks.encF64(a)))
      assert(back.length == a.length)
      a.indices.foreach(i => assert(
        java.lang.Double.doubleToRawLongBits(a(i)) ==
          java.lang.Double.doubleToRawLongBits(back(i))))
    }
    val genF = Gen.oneOf(
      Gen.chooseNum(-100000, 100000).map(_ / 10.0f),
      Gen.chooseNum(Int.MinValue, Int.MaxValue).map(java.lang.Float.intBitsToFloat))
    samples(Gen.listOf(genF), 200).foreach { vs =>
      val a = vs.toArray
      val back = PrimBlocks.decF32(new ByteReader(PrimBlocks.encF32(a)))
      assert(back.length == a.length)
      a.indices.foreach(i => assert(
        java.lang.Float.floatToRawIntBits(a(i)) ==
          java.lang.Float.floatToRawIntBits(back(i))))
    }
  }

  test("binary payloads round-trip including empty and high bytes") {
    val gen = Gen.listOf(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    samples(gen, 200).foreach { vs =>
      val a = vs.toArray
      val back = PrimBlocks.decBin(new ByteReader(PrimBlocks.encBin(a)))
      assert(back.length == a.length)
      a.indices.foreach(i => assert(back(i).sameElements(a(i))))
    }
  }

  test("NULLABLE wrapper scatters presence exactly; ARR wrapper reslices") {
    val gen = Gen.listOf(Gen.option(Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    samples(gen, 200).foreach { vs =>
      val present = vs.map(_.isDefined).toArray
      val dense = vs.flatten.toArray
      val wrapped = PrimBlocks.wrapNullable(
        vs.length, present, LongBlocks.encodeAuto(dense))
      val in = new ByteReader(wrapped)
      val (n, p2) = PrimBlocks.unwrapNullable(in)
      assert(n == vs.length && p2.sameElements(present))
      assert(LongBlocks.decodeReader(in).sameElements(dense))
      assert(PrimBlocks.codecName(wrapped).startsWith("nullable+"))
    }
    // ARR: lengths + flat stream
    val lens = Array(0, 3, 1, 0, 5)
    val flat = Array.tabulate(9)(_ * 7)
    val arr = PrimBlocks.wrapArr(lens, IntBlocks.encodeAuto(flat))
    val in = new ByteReader(arr)
    assert(PrimBlocks.unwrapArr(in).sameElements(lens))
    assert(IntBlocks.decodeReader(in).sameElements(flat))
    assert(PrimBlocks.codecName(arr).startsWith("arr+"))
  }
}
