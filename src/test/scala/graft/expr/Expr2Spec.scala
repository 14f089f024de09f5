package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions._

/** Unit tests for the second wave of expressions: string-block encode,
  * manifest helpers (codec name, dict hash), range bucketing, sketches.
  */
class Expr2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("WordShingles equals the HOF shingle formulation, element for element") {
    import spark.implicits._
    // edge cases: empty text, single word, exactly k words, trailing /
    // doubled spaces (split keeps empty tokens), unicode, repeats
    val texts = Seq(
      "", " ", "a", "a b", "a b c", "a b c d e",
      "a  b c", "a b c ", " a b c", "x x x x x",
      "héllo wörld ünïcode σπαρκ δοκ", "tab	word stays one-token")
      .toDF("text")
    val k = 3
    val words = split(col("text"), " ")
    val hof = array_distinct(transform(
      sequence(lit(1), greatest(size(words) - (k - 1), lit(1))),
      i => array_join(slice(words, i, lit(k)), " ")))
    val rows = texts.select(
      graft.ops.Dedup.shingles(col("text"), k).as("native"), hof.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
    }
    // and on the real corpus: every document, both k=2 and k=3
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Seq(2, 3).foreach { kk =>
      val w2 = split(col("text"), " ")
      val h2 = array_distinct(transform(
        sequence(lit(1), greatest(size(w2) - (kk - 1), lit(1))),
        i => array_join(slice(w2, i, lit(kk)), " ")))
      val bad = docs.select(
        graft.ops.Dedup.shingles(col("text"), kk).as("n"), h2.as("h"))
        .where(not(col("n") <=> col("h"))).count()
      assert(bad == 0L, s"k=$kk: $bad docs differ")
    }
  }
  import spark.implicits._

  test("graft_encode_str/graft_decode_str round-trip all string shapes") {
    val rows = Seq(
      Seq("0", "1", "2", "3"),                       // str_numeric
      Seq("a", "b", "a", "a", "b"),                  // str_dict
      Seq("", "unicode-γ", "with space", "\n\t"),    // str_plain
      Seq.empty[String])
    val df = rows.toDF("vals")
      .withColumn("dec", graft_decode_str(graft_encode_str($"vals")))
    assert(df.where(!($"vals" <=> $"dec")).count() == 0)
  }

  test("graft_codec reports the selected family per payload") {
    // force each codec and read its name back
    graft.codec.IntBlocks.idOf.keys.foreach { name =>
      val got = Seq(Seq(1, 2, 3, 2, 1, 2, 3)).toDF("vals")
        .select(graft_codec(graft_encode($"vals", name)))
        .as[String].head()
      assert(got == name, s"$name -> $got")
    }
    val strName = Seq(Seq("x", "y")).toDF("vals")
      .select(graft_codec(graft_encode_str($"vals"))).as[String].head()
    assert(graft.codec.StrBlocks.names.values.toSet.contains(strName))
  }

  test("graft_dict_hash: stable, dict-section-scoped") {
    val a = Seq(Seq(1, 2, 3, 1, 2, 3, 1, 2, 3)).toDF("vals")
      .select(graft_dict_hash(graft_encode($"vals", "dict"))).as[String].head()
    // same dictionary, different order → same dict-section hash
    val b = Seq(Seq(3, 2, 1, 3, 2, 1, 3, 2, 1)).toDF("vals")
      .select(graft_dict_hash(graft_encode($"vals", "dict"))).as[String].head()
    assert(a == b)
    assert(a.matches("[0-9a-f]{64}"))
    // different dictionary → different hash
    val c = Seq(Seq(7, 8, 9, 7, 8, 9)).toDF("vals")
      .select(graft_dict_hash(graft_encode($"vals", "dict"))).as[String].head()
    assert(a != c)
  }

  test("RangeBucket edges: below, on-bound, between, above") {
    val bounds = IndexedSeq(10L, 20L, 30L)
    val df = Seq(Long.MinValue, 9L, 10L, 15L, 20L, 29L, 30L, 31L, Long.MaxValue)
      .toDF("k")
      .select($"k", graft_range_bucket($"k", bounds).as("b"))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(Long.MinValue) == 0)
    assert(got(9L) == 0)
    assert(got(10L) == 1) // bound is the first key of the next bucket
    assert(got(15L) == 1)
    assert(got(20L) == 2)
    assert(got(29L) == 2)
    assert(got(30L) == 3)
    assert(got(31L) == 3)
    assert(got(Long.MaxValue) == 3)
  }

  test("minhash signature equality probability tracks Jaccard") {
    val a = (0 until 100).map(i => s"sh$i")
    val b = (10 until 110).map(i => s"sh$i") // Jaccard = 90/110 ≈ 0.818
    val df = Seq((a, b)).toDF("a", "b")
      .select(
        graft_minhash($"a", 256).as("sa"),
        graft_minhash($"b", 256).as("sb"))
      .select(size(filter(zip_with($"sa", $"sb", (x, y) => x === y), c => c)).as("agree"))
    val agree = df.as[Int].head()
    // E[agree] = 256 * 0.818 ≈ 209; allow wide tolerance
    assert(agree > 170 && agree < 245, s"agree=$agree")
  }

  test("corrupt payloads fail with a clear error, not a JVM crash") {
    val garbage = Array[Byte](99, 1, 2, 3) // unknown codec id 99
    val ex = intercept[Exception] {
      Seq(Tuple1(garbage)).toDF("p").select(graft_decode($"p")).collect()
    }
    assert(ex.getMessage != null)
    val ex2 = intercept[Exception] {
      Seq(Tuple1(garbage)).toDF("p").select(graft_decode_str($"p")).collect()
    }
    assert(ex2.getMessage != null)
  }

  test("sketch functions are callable from SQL") {
    Seq((Seq("a", "b", "c"), Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
      .toDF("words", "va", "vb").createOrReplaceTempView("sk")
    val row = spark.sql(
      """SELECT size(graft_minhash(words, 16)) AS mh,
        |       graft_simhash(words) AS sh,
        |       graft_cosine(va, vb) AS cos,
        |       graft_hyperplane_sig(va, 12) AS hs,
        |       size(graft_hyperplane_bands(va, 8, 4)) AS hb
        |FROM sk""".stripMargin).head()
    assert(row.getInt(0) == 16)
    assert(row.getDouble(2) == 0.0)
    assert(row.getLong(3) >= 0L && row.getLong(3) < (1L << 12))
    assert(row.getInt(4) == 8)
    // band keys are exactly the signature slices (one sig computation)
    val chk = spark.sql(
      """SELECT graft_hyperplane_sig(va, 32) AS sig,
        |       graft_hyperplane_bands(va, 8, 4) AS bands
        |FROM sk""".stripMargin).head()
    val sig = chk.getLong(0)
    val bands = chk.getSeq[Long](1)
    (0 until 8).foreach(b => assert(bands(b) == ((sig >>> (b * 4)) & 0xFL)))
  }

  test("graft_cosine matches the HOF formulation bit for bit") {
    val vs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(0.5f, -0.25f), Array(-0.5f, 0.25f)))
    val df = vs.toDF("a", "b")
    val native = df.select(graft.ops.Similarity.cosine($"a", $"b")).as[Double].collect()
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v) /
        (sqrt(aggregate($"a", lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))) *
          sqrt(aggregate($"b", lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))))
      .as[Double].collect()
    assert(native.toSeq == hof.toSeq)
  }
}
