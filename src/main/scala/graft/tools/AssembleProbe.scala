package graft.tools

import org.apache.spark.sql.{Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.GenericAssembler

/** Attributes the generic-lane encode CPU on a lineitem-shaped frame:
  * internal-row iteration floor vs external-Row deserialization vs the
  * full assemble (buffering + plain-bytes + codec trials). Single
  * worker thread so the numbers are CPU, not scheduling.
  *
  * Usage: runMain graft.tools.AssembleProbe [sfDir]
  */
object AssembleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[1]")
      .config("spark.sql.shuffle.partitions", 1)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case DateType => col(f.name).cast("int").as(f.name)
        case TimestampType | TimestampNTZType =>
          unix_micros(col(f.name).cast("timestamp")).as(f.name)
        case _: DecimalType => col(f.name).cast("double").as(f.name)
        case _ => col(f.name)
      }
    }
    val keyed = df.select(cols.toIndexedSeq: _*)
      .withColumn("_graft_key", col("l_orderkey").cast("long"))
      .withColumn("_graft_rh", xxhash64(df.columns.map(col).toIndexedSeq: _*))
    val nLeaves = df.columns.length
    val kinds = df.schema.fields.map { f =>
      f.dataType match {
        case IntegerType | DateType => "int"
        case LongType | TimestampType | TimestampNTZType => "long"
        case StringType => "string"
        case DoubleType | _: DecimalType => "f64"
        case FloatType => "f32"
        case other => throw new IllegalArgumentException(other.toString)
      }
    }
    val withBlocks = keyed
      .withColumn("block_id", (col("_graft_key") % 73L).cast("int"))
      .select(Seq(col("block_id"), col("_graft_key").as("k"),
        col("_graft_rh").as("rh")) ++ df.columns.map(col): _*)
      .repartition(1, col("block_id"))
      .sortWithinPartitions(col("block_id"), col("k"), col("rh"))

    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"ASSEMBLE $label ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
    }

    val outSchema = StructType(IndexedSeq(
      StructField("block_id", IntegerType, nullable = false),
      StructField("ver", IntegerType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("key_min", LongType, nullable = false),
      StructField("key_max", LongType, nullable = false),
      StructField("plain_bytes", LongType, nullable = false),
      StructField("row_xor", LongType, nullable = false),
      StructField("row_sum", LongType, nullable = false)) ++
      kinds.indices.map(i => StructField(s"pl_$i", BinaryType, nullable = false)))

    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("internal-row floor") {
        withBlocks.queryExecution.toRdd.mapPartitions { it =>
          var n = 0L
          while (it.hasNext) { it.next(); n += 1 }
          Iterator(n)
        }.collect().sum
      }
      t("external-Row iterate+get") {
        withBlocks.mapPartitions { it =>
          var n = 0L
          val width = 3 + nLeaves
          while (it.hasNext) {
            val r = it.next()
            var i = 0
            while (i < width) { r.get(i); i += 1 }
            n += 1
          }
          Iterator(n)
        }(Encoders.scalaLong).collect().sum
      }
      t("full assemble") {
        withBlocks.mapPartitions(it => GenericAssembler.assemble(it, 1, kinds))(
          Encoders.row(outSchema))
          .selectExpr("sum(plain_bytes)").head().getLong(0)
      }
    }
    spark.stop()
  }
}
