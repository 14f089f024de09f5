package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Similarity}

/** ANN introspection CLI: recall of the two scale paths (banded hyperplane
  * LSH, IVF multi-probe) against exact brute force on a real embeddings
  * table — "what would this index configuration cost me in recall here".
  *
  * Usage: runMain graft.tools.AnnProbe [sfDir]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
    def recallOf(hits: Set[(Long, Long, Long)]): Double =
      (brute & hits).size.toDouble / brute.size

    for ((bands, rows) <- Seq((8, 4), (16, 2), (24, 2))) {
      val lsh = Similarity.lshTopK(emb, queries, 5, bands, rows)
        .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
      println(f"ANN lsh bands=$bands%2d rows=$rows recall=${recallOf(lsh)}%.3f exact=${lsh == brute}")
    }
    val idx = Ivf.build(emb, numCentroids = 22)
    for (np <- Seq(4, 8, 12, 22)) {
      val ivf = Ivf.topK(idx, queries, 5, np)
        .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
      println(f"ANN ivf k=22 nprobe=$np%2d recall=${recallOf(ivf)}%.3f exact=${ivf == brute}")
    }
    spark.stop()
  }
}
