package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.table.{GraftTable, Tokenize}

/** DataSource V2 connector tests: `spark.read.format("graft")` must agree
  * with [[GraftTable.decode]] bit for bit, prune columns down to the
  * payloads actually needed, and prune blocks from pushed doc_id/source
  * filters — with the filters still applied residually (pruning is an
  * optimization, never the correctness mechanism).
  */
class DataSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.001"

  private lazy val tableDir: String = {
    val dir = Files.createTempDirectory("graft-dsv2").toString
    GraftTable.encode(
      Tokenize.tokenTable(spark, SfDir).toDF(), dir,
      GraftTable.Options(targetRowsPerBlock = 64))
    dir
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case s: BatchScanExec => s }.get

  test("format(\"graft\") read equals decode() bit for bit") {
    val viaDsv2 = spark.read.format("graft").load(tableDir)
      .orderBy(col("doc_id").cast("long"))
      .collect().map(r => (r.getString(0), r.getSeq[Int](1), r.getInt(2), r.getString(3)))
    val viaApi = GraftTable.decode(spark, tableDir).toDF()
      .orderBy(col("doc_id").cast("long"))
      .collect().map(r => (r.getString(0), r.getSeq[Int](1), r.getInt(2), r.getString(3)))
    assert(viaDsv2.length == 500)
    assert(viaDsv2.sameElements(viaApi))
  }

  test("column pruning reaches the connector (tokens-only, n_tok-only)") {
    val nOnly = spark.read.format("graft").load(tableDir).select("n_tok")
    assert(scanOf(nOnly).scan.readSchema().fieldNames.toSeq == Seq("n_tok"))
    assert(nOnly.agg(sum("n_tok")).head().getLong(0) ==
      GraftTable.decode(spark, tableDir).toDF().agg(sum("n_tok")).head().getLong(0))
    val tokOnly = spark.read.format("graft").load(tableDir).select("tokens")
    assert(scanOf(tokOnly).scan.readSchema().fieldNames.toSeq == Seq("tokens"))
    assert(tokOnly.select(sum(expr("aggregate(tokens, 0L, (a, t) -> a + t)"))).head().getLong(0) ==
      GraftTable.decode(spark, tableDir).toDF()
        .select(sum(expr("aggregate(tokens, 0L, (a, t) -> a + t)"))).head().getLong(0))
  }

  test("doc_id equality prunes blocks at plan time and still answers exactly") {
    val df = spark.read.format("graft").load(tableDir).where(col("doc_id") === "123")
    val scan = scanOf(df).scan.asInstanceOf[GraftScan]
    // 500 docs at 64 rows/block → ≥ 8 blocks; equality must prune to few
    val desc = scan.description()
    val pruned = "blocks=(\\d+)/".r.findFirstMatchIn(desc).get.group(1).toInt
    assert(pruned >= 1 && pruned < 4, s"expected tight pruning, got: $desc")
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getString(0) == "123")
  }

  test("source IN (...) prunes via src_list and count(*) survives empty prune") {
    val df = spark.read.format("graft").load(tableDir)
      .where(col("source").isin("src3", "src7"))
    val expect = GraftTable.decode(spark, tableDir).toDF()
      .where(col("source").isin("src3", "src7")).count()
    assert(df.count() == expect && expect > 0)
    // a source that exists nowhere prunes every block -> zero partitions
    val none = spark.read.format("graft").load(tableDir)
      .where(col("source") === "no_such_source")
    assert(none.count() == 0)
    // count(*) with no columns requested still counts every row
    assert(spark.read.format("graft").load(tableDir).count() == 500)
  }

  test("COUNT(*) answers from snapshot metadata; appended versions scan fine") {
    val dir = Files.createTempDirectory("graft-dsv2-ct").toString
    val opts = GraftTable.Options(targetRowsPerBlock = 64)
    val tok = Tokenize.tokenTable(spark, SfDir).toDF()
    GraftTable.encode(tok.where(col("doc_id").cast("long") < 300), dir, opts)
    GraftTable.append(tok.where(col("doc_id").cast("long") >= 300), dir, opts)
    // metadata-only count: the physical scan is the count scan, no files
    val cnt = spark.read.format("graft").load(dir).count()
    assert(cnt == 500)
    val plan = spark.read.format("graft").load(dir)
      .groupBy().count().queryExecution.executedPlan
    val scan = plan.collectFirst { case s: BatchScanExec => s }.get
    assert(scan.scan.isInstanceOf[GraftCountScan], scan.scan.getClass.toString)
    // a filtered count cannot use the shortcut and still answers exactly
    val filtered = spark.read.format("graft").load(dir)
      .where(col("source") === "src1")
    assert(filtered.count() ==
      GraftTable.decode(spark, dir).toDF().where(col("source") === "src1").count())
    assert(!scanOf(filtered).scan.isInstanceOf[GraftCountScan])
    // full read across BOTH versions matches decode
    assert(spark.read.format("graft").load(dir)
      .agg(sum("n_tok")).head().getLong(0) ==
      GraftTable.decode(spark, dir).toDF().agg(sum("n_tok")).head().getLong(0))
    // doc_id pruning works across versions too
    val one = spark.read.format("graft").load(dir).where(col("doc_id") === "350")
    assert(one.collect().map(_.getString(0)).toSeq == Seq("350"))
  }

  test("LIMIT pushes into the reader (per-partition early stop, exact rows)") {
    val df = spark.read.format("graft").load(tableDir).limit(7)
    assert(df.count() == 7)
    assert(df.collect().length == 7)
    // with a filter, limit composes and stays correct
    val f = spark.read.format("graft").load(tableDir)
      .where(col("source") === "src1").limit(3)
    val rows = f.collect()
    assert(rows.length == 3 && rows.forall(_.getString(3) == "src1"))
  }

  test("SQL: CREATE TABLE USING graft reads through the connector") {
    spark.sql("DROP TABLE IF EXISTS graft_dsv2")
    spark.sql(
      s"CREATE TABLE graft_dsv2 USING graft OPTIONS (path '$tableDir')")
    val n = spark.sql(
      "SELECT count(*) c FROM graft_dsv2 WHERE source = 'src1'").head().getLong(0)
    val expect = GraftTable.decode(spark, tableDir).toDF()
      .where(col("source") === "src1").count()
    assert(n == expect && n > 0)
    spark.sql("DROP TABLE graft_dsv2")
  }

  test("generic-lane tables are rejected with a pointed error") {
    val dir = Files.createTempDirectory("graft-dsv2-gen").toString
    graft.table.GenericTable.encode(
      spark.read.parquet(s"$SfDir/documents.parquet"), dir, keyCol = "doc_id")
    val e = intercept[Exception](spark.read.format("graft").load(dir).collect())
    assert(e.getMessage.contains("generic"))
  }
}
