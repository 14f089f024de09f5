package graft.table

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Durable catalog (SURVEY.md R7): registrations persist as a metadata
  * file and restore into a brand-new session — the property round-1's
  * temp-view-only registration lacked.
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("catalog registration survives a new session") {
    val tdir = Files.createTempDirectory("graft-cattab").toString
    val cdir = Files.createTempDirectory("graft-catmeta").toString
    GraftTable.encode(
      Tokenize.tokenTable(spark, "/root/testdata/sf0.001").toDF(), tdir,
      GraftTable.Options(targetRowsPerBlock = 128))

    GraftCatalog.register(spark, cdir, "graftcat", tdir)
    assert(spark.sql("SELECT count(*) FROM graftcat").head().getLong(0) == 500)

    // a NEW session has a fresh temp-view registry: the name is gone...
    val s2 = spark.newSession()
    intercept[Exception](s2.sql("SELECT count(*) FROM graftcat").collect())
    // ...until the catalog file restores it
    val restored = GraftCatalog.restore(s2, cdir)
    assert(restored == Seq("graftcat"))
    assert(s2.sql("SELECT count(*) FROM graftcat").head().getLong(0) == 500)
    assert(s2.sql("SELECT count(*) FROM graftcat_manifest").head().getLong(0) > 0)
    assert(s2.sql("SELECT count(*) FROM graftcat_blocks").head().getLong(0) > 0)
  }

  test("catalog views route through the connector (pushdown in SQL)") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val tdir = Files.createTempDirectory("graft-catpush").toString
    val cdir = Files.createTempDirectory("graft-catpushm").toString
    GraftTable.encode(
      Tokenize.tokenTable(spark, "/root/testdata/sf0.001").toDF(), tdir,
      GraftTable.Options(targetRowsPerBlock = 64))
    GraftCatalog.register(spark, cdir, "graftpush", tdir)
    // COUNT(*) over the view answers from snapshot metadata
    val cnt = spark.sql("SELECT count(*) FROM graftpush")
    val scan = cnt.queryExecution.executedPlan
      .collectFirst { case s: BatchScanExec => s }.get.scan
    assert(scan.isInstanceOf[graft.sources.GraftCountScan], scan.getClass.toString)
    assert(cnt.head().getLong(0) == 500)
    // a filtered projection prunes blocks and columns through the view
    val q = spark.sql("SELECT n_tok FROM graftpush WHERE doc_id = '123'")
    val s2 = q.queryExecution.executedPlan
      .collectFirst { case s: BatchScanExec => s }.get.scan
    assert(s2.readSchema().fieldNames.toSet.subsetOf(Set("doc_id", "n_tok")))
    assert(s2.description().contains("EqualTo(doc_id,123)"), s2.description())
    assert(q.collect().length == 1)
    // generic tables get the same treatment (key-range interval pushdown)
    val gdir = Files.createTempDirectory("graft-catpushg").toString
    GenericTable.encode(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      gdir, keyCol = "doc_id", opts = GraftTable.Options(targetRowsPerBlock = 64))
    GraftCatalog.register(spark, cdir, "graftpushg", gdir)
    val g = spark.sql(
      "SELECT lang FROM graftpushg WHERE doc_id BETWEEN 100 AND 120")
    val s3 = g.queryExecution.executedPlan
      .collectFirst { case s: BatchScanExec => s }.get.scan
    assert(s3.description().contains("range=[100,120]"), s3.description())
    assert(g.collect().length == 21)
  }

  test("catalog upsert and drop") {
    val tdir = Files.createTempDirectory("graft-cattab2").toString
    val cdir = Files.createTempDirectory("graft-catmeta2").toString
    GraftTable.encode(
      Tokenize.tokenTable(spark, "/root/testdata/sf0.001").toDF(), tdir,
      GraftTable.Options(targetRowsPerBlock = 256))
    GraftCatalog.register(spark, cdir, "a", tdir)
    GraftCatalog.register(spark, cdir, "b", tdir)
    GraftCatalog.register(spark, cdir, "a", tdir) // upsert, no dup
    assert(GraftCatalog.entries(spark, cdir).map(_.name) == Seq("a", "b"))
    GraftCatalog.drop(spark, cdir, "a")
    assert(GraftCatalog.entries(spark, cdir).map(_.name) == Seq("b"))
  }
}
