package graft.tools

import org.apache.spark.sql.SparkSession
import graft.codec.{IntBlocks, StrBlocks}

/** Introspection CLI: tokenize a real documents table, push every column
  * through the codec core, and print choices / sizes / round-trip status.
  * The "ebenezer introspect/cat" analogue for this engine (SURVEY.md R9).
  *
  * Usage: runMain graft.tools.CodecProbe [sfDir]
  */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("cast(doc_id as string) doc_id", "text", "source")
      .orderBy($"doc_id".cast("long"))
      .collect()

    val vocab = docs.flatMap(_.getString(1).split(' ')).distinct.sorted
    val tid = vocab.zipWithIndex.toMap
    println(s"docs=${docs.length} vocab=${vocab.length}")

    val docIds = docs.map(_.getString(0))
    val sources = docs.map(_.getString(2))
    val tokensPerDoc = docs.map(_.getString(1).split(' ').map(tid))
    val nTok = tokensPerDoc.map(_.length)
    val flat = tokensPerDoc.flatten

    def report(col: String, enc: Array[Byte], plainBytes: Long, ok: Boolean,
               choice: String, cands: Map[String, Long]): Unit = {
      println(f"$col%-8s codec=$choice%-11s bytes=${enc.length}%8d plain=$plainBytes%8d " +
        f"ratio=${enc.length.toDouble / plainBytes}%.4f roundtrip=${if (ok) "OK" else "MISMATCH"} candidates=$cands")
    }

    val (tokEnc, tokChoice) = IntBlocks.encodeAutoChoice(flat)
    report("tokens", tokEnc, 4L * flat.length,
      IntBlocks.decode(tokEnc).sameElements(flat), tokChoice.name, tokChoice.candidateSizes)

    val (ntEnc, ntChoice) = IntBlocks.encodeAutoChoice(nTok)
    report("n_tok", ntEnc, 4L * nTok.length,
      IntBlocks.decode(ntEnc).sameElements(nTok), ntChoice.name, ntChoice.candidateSizes)

    val (idEnc, idChoice) = StrBlocks.encodeAutoChoice(docIds)
    report("doc_id", idEnc, docIds.map(_.length + 4L).sum,
      StrBlocks.decode(idEnc).sameElements(docIds), idChoice.name, idChoice.candidateSizes)

    val (srcEnc, srcChoice) = StrBlocks.encodeAutoChoice(sources)
    report("source", srcEnc, sources.map(_.length + 4L).sum,
      StrBlocks.decode(srcEnc).sameElements(sources), srcChoice.name, srcChoice.candidateSizes)

    val totalEnc = tokEnc.length + ntEnc.length + idEnc.length + srcEnc.length
    val parquetBytes = new java.io.File(s"$sfDir/documents.parquet").length()
    println(s"total encoded bytes=$totalEnc (tokens=${flat.length}); " +
      s"source documents.parquet=$parquetBytes B")
    println("dict hashes: tokens=" + IntBlocks.dictSectionHash(tokEnc).take(16) +
      " source=" + StrBlocks.dictSectionHash(srcEnc).take(16))

    // --- Catalyst expression path: the same columns through spark.sql ---
    graft.functions.register(spark)
    import org.apache.spark.sql.functions.{col, element_at, size, split, transform, typedLit}
    val vocabMap = typedLit(tid)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").cast("string").as("doc_id"),
        transform(split(col("text"), " "), w => element_at(vocabMap, w)).as("tokens"),
        col("source"))
      .withColumn("n_tok", size(col("tokens")))
      .createOrReplaceTempView("token_table")
    spark.sql(
      """SELECT count(*) AS docs,
        |       sum(n_tok) AS tokens,
        |       sum(CASE WHEN graft_decode(graft_encode(tokens)) <=> tokens THEN 0 ELSE 1 END) AS auto_mismatch,
        |       sum(CASE WHEN graft_decode(graft_encode(tokens, 'rle')) <=> tokens THEN 0 ELSE 1 END) AS rle_mismatch,
        |       sum(octet_length(graft_encode(tokens))) AS auto_bytes,
        |       sum(octet_length(graft_encode(tokens, 'bitpack'))) AS bitpack_bytes
        |FROM token_table""".stripMargin).show(false)

    if (args.contains("--probe-errors")) {
      def probe(label: String)(f: => Unit): Unit =
        try { f; println(s"PROBE $label: NO ERROR (unexpected)") }
        catch { case e: Throwable =>
          val root = Option(e.getCause).getOrElse(e)
          println(s"PROBE $label: ${root.getClass.getSimpleName}: ${root.getMessage.linesIterator.next()}")
        }
      probe("encode-wrong-type") {
        spark.sql("SELECT graft_encode(source) FROM token_table").collect()
      }
      probe("decode-corrupt-payload") {
        spark.sql("SELECT graft_decode(cast('garbage!' as binary)) ").collect()
      }
      probe("unknown-codec-name") {
        spark.sql("SELECT graft_encode(tokens, 'lz77') FROM token_table").collect()
      }
    }
    spark.stop()
  }
}
