package graft.tools
import org.apache.spark.sql.SparkSession
import graft.codec.IntBlocks
object TrialCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // real sf0.1 corpus tokens, concatenated in doc order into one block
    val rows = graft.table.Tokenize.tokenTable(spark, "/root/testdata/sf0.1")
      .collect().sortBy(r => (r.doc_id.length, r.doc_id))
    val flat = rows.flatMap(_.tokens)
    val block = flat.take(442000)
    println(s"block n=${block.length}")
    def time(tag: String, allowDict: Boolean, allowFsst: Boolean): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        var reps = 0
        while (reps < 10) { IntBlocks.encodeAutoChoice(block, allowDict, allowFsst); reps += 1 }
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"TRIAL $tag run$i ${dt / 10 * 1000}%.1f ms/block ${block.length * 10 / dt / 1e6}%.1f Mtok/s/core")
      }
    }
    time("all", allowDict = true, allowFsst = true)
    time("nofsst", allowDict = true, allowFsst = false)
    time("nodict-nofsst", allowDict = false, allowFsst = false)
    val (_, c) = IntBlocks.encodeAutoChoice(block, true, true)
    println(s"sizes: ${c.candidateSizes.toSeq.sortBy(_._2)}")
    spark.stop()
  }
}
