package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions._

/** Catalyst-expression path tests (SURVEY.md §5.2 item 2): the same
  * round-trip properties as CodecSpec but through DataFrame plans, plus
  * null handling, SQL registration, and whole-stage codegen presence.
  */
class ExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tokenDf = {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(rnd.nextInt(100) + 1)(rnd.nextInt(31)))
    } :+ ((200L, Array.empty[Int]))
    rows.toDF("id", "tokens")
  }

  test("graft_encode/graft_decode round-trip through a DataFrame plan") {
    val out = tokenDf
      .withColumn("payload", graft_encode($"tokens"))
      .withColumn("decoded", graft_decode($"payload"))
      .withColumn("ok", $"decoded" <=> $"tokens")
    assert(out.where(!$"ok").count() == 0)
    assert(out.count() == 201)
  }

  test("forced-codec encode round-trips for every codec") {
    Seq("plain", "bitpack", "for", "delta_for", "rle", "dict").foreach { codec =>
      val bad = tokenDf
        .withColumn("decoded", graft_decode(graft_encode($"tokens", codec)))
        .where(!($"decoded" <=> $"tokens"))
        .count()
      assert(bad == 0, s"codec $codec")
    }
  }

  test("null row propagates null, not a crash") {
    val df = Seq((1, Some(Array(1, 2, 3))), (2, None))
      .toDF("id", "tokens")
    val out = df.withColumn("payload", graft_encode($"tokens"))
      .withColumn("decoded", graft_decode($"payload"))
      .collect()
    assert(out.find(_.getInt(0) == 2).get.isNullAt(2)) // payload
    assert(out.find(_.getInt(0) == 2).get.isNullAt(3)) // decoded
    assert(out.find(_.getInt(0) == 1).get.getSeq[Int](3) == Seq(1, 2, 3))
  }

  test("SQL registration: selectExpr path works") {
    tokenDf.createOrReplaceTempView("tok")
    val bad = spark.sql(
      """SELECT count(*) c FROM tok
        |WHERE NOT (graft_decode(graft_encode(tokens, 'rle')) <=> tokens)""".stripMargin)
      .as[Long].head()
    assert(bad == 0)
  }

  test("graft_reslice rebuilds per-row arrays from a flat stream") {
    val df = Seq((Array(1, 2, 3, 4, 5, 6), Array(1, 2, 0, 3)))
      .toDF("flat", "lens")
      .select(graft_reslice($"flat", $"lens").as("rows"))
    val rows = df.as[Seq[Seq[Int]]].head()
    assert(rows == Seq(Seq(1), Seq(2, 3), Seq(), Seq(4, 5, 6)))
  }

  test("graft_reslice rejects inconsistent lengths") {
    val ex = intercept[Exception] {
      Seq((Array(1, 2, 3), Array(1, 1))).toDF("flat", "lens")
        .select(graft_reslice($"flat", $"lens")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("expressions stay inside whole-stage codegen") {
    // repartition defeats ConvertToLocalRelation so the project actually
    // plans (otherwise the optimizer folds it into a LocalTableScan); run
    // the query first so AQE finalizes and WSCG decisions are visible
    val df = tokenDf.repartition(2)
      .withColumn("decoded", graft_decode(graft_encode($"tokens")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // "*(n) Project" is the WholeStageCodegen marker in plan toString —
    // our encode/decode project must be inside a codegen stage
    assert("""\*\(\d+\) Project \[.*graft_decode""".r.findFirstIn(plan).isDefined, plan)
  }

  test("decoded blocks match StrBlocks through the expression path") {
    val payload = graft.codec.StrBlocks.encodeAuto(Array("a", "b", "a", "c"))
    val df = Seq(Tuple1(payload)).toDF("p")
      .select(graft_decode_str($"p").as("vals"))
    assert(df.as[Seq[String]].head() == Seq("a", "b", "a", "c"))
  }

  test("unknown codec name fails analysis-time, not task-time") {
    val ex = intercept[IllegalArgumentException] {
      graft_encode($"x", "bogus")
    }
    assert(ex.getMessage.contains("unknown codec"))
  }
}
