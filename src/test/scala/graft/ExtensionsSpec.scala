package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path: a session built with
  * graft.GraftExtensions has every graft_* function available without any
  * driver-side register() call.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions registers all functions") {
    // force the shared test session up first so newSession-style isolation
    // doesn't fight over the SparkContext, then build an extended session
    TestSpark.spark
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = s.sql(
        """SELECT graft_decode(graft_encode(array(1, 2, 3))) AS rt,
          |       graft_codec(graft_encode(array(5, 5, 5, 5), 'rle')) AS c,
          |       graft_cosine(array(float(1), float(0)), array(float(1), float(0))) AS cos,
          |       size(graft_minhash(array('a','b'), 8)) AS mh,
          |       size(graft_hyperplane_bands(array(float(1), float(0)), 8, 4)) AS hb
          |""".stripMargin).head()
      assert(row.getSeq[Int](0) == Seq(1, 2, 3))
      assert(row.getString(1) == "rle")
      assert(row.getDouble(2) == 1.0)
      assert(row.getInt(3) == 8)
      assert(row.getInt(4) == 8)
    } finally {
      // the underlying SparkContext is shared with TestSpark — do not stop
    }
  }
}
