package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.{GenericTable, GraftTable, Tokenize}

/** Times the bench's scratch-table builds in isolation (the cold-path cost
  * the driver's first-call numbers carry). Run with GRAFT_TIMING=1 for
  * per-phase attribution inside each encode.
  *
  * Usage: runMain graft.tools.ScratchBuildProbe [sfDir]
  */
object ScratchBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

    def t(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val base = "/tmp/graft-probe-tables"
    fs.delete(new Path(base), true)
    val opts128 = GraftTable.Options(targetRowsPerBlock = 128)

    t("vocab+tokenTable") { Tokenize.cachedVocab(spark, sfDir) }
    t("f6 token encode") {
      GraftTable.encode(Tokenize.tokenTable(spark, sfDir).toDF(), s"$base/f6", opts128)
    }
    t("L1 lineitem encode") {
      GenericTable.encode(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        s"$base/L1", keyCol = "l_orderkey",
        opts = GraftTable.Options(targetRowsPerBlock = 8192))
    }
    t("g1 documents encode") {
      GenericTable.encode(spark.read.parquet(s"$sfDir/documents.parquet"),
        s"$base/g1", opts = opts128)
    }
    t("DL encode+2 deletes") {
      GenericTable.encode(spark.read.parquet(s"$sfDir/documents.parquet"),
        s"$base/DL", keyCol = "doc_id", opts = opts128)
      GenericTable.deleteRange(spark, s"$base/DL", 100L, 149L)
      GenericTable.deleteWhere(spark, s"$base/DL", col("lang") === "de")
    }
    t("UP encode+upsert") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      GenericTable.encode(docs, s"$base/UP", keyCol = "doc_id", opts = opts128)
      val batch = docs.where(col("doc_id").between(50L, 59L))
        .withColumn("lang", lit("xx"))
        .unionByName(docs.where(col("doc_id") < 10L)
          .withColumn("doc_id", col("doc_id") + 100000L)
          .withColumn("lang", lit("zz")))
      GenericTable.upsertByKey(batch, s"$base/UP", opts128)
    }
    t("E evolve 2 encodes") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      GenericTable.encode(
        docs.where(col("doc_id") < 250).select("doc_id", "text", "source"),
        s"$base/E1", keyCol = "doc_id", opts128)
      GenericTable.append(docs.where(col("doc_id") >= 250), s"$base/E1", opts128)
    }
    spark.stop()
  }
}
