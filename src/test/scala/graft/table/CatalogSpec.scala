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
