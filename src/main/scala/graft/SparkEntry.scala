package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{graft_decode, graft_encode}
import graft.ops.{Dedup, Ivf, Similarity, TextAnalysis}
import graft.table.{GenericTable, GraftTable, Tokenize}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is DuckDB-oracle-checkable (Verify.scala dumps results +
  * oracle_sql.json; the driver compares row/schema/hash). Column names and
  * types are aligned on both sides: all counts/sums cast to BIGINT, no
  * floating-point aggregates in hashed output.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the whole engine: tokenize → stats → block encode → manifest
    * → decode → per-source aggregation of the decoded table.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_roundtrip_table")(spark, "/root/testdata/sf0.001")

  /** Encode the sfDir token table into a deterministic scratch location
    * (idempotent: a complete table resumes as a no-op) and return its dir.
    * Path carries a format tag so stale tables from older code never leak
    * in. Cached per (application, sfDir): the input is a pure function of
    * the path, so after the first encode this session the later queries
    * can skip even the resume/confirm scans — application-layer knowledge
    * the engine itself must not assume.
    */
  private val tableDirCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private def encodedTableDir(spark: SparkSession, sfDir: String): String =
    tableDirCache.getOrElseUpdate((spark.sparkContext.applicationId, sfDir), {
      val dir = "/tmp/graft-tables/f6-" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      GraftTable.encode(
        Tokenize.tokenTable(spark, sfDir).toDF(), dir,
        GraftTable.Options(targetRowsPerBlock = 128))
      dir
    })

  /** Generic (any-schema) twin of [[encodedTableDir]]: documents.parquet
    * encoded AS-IS (all five columns) through the generic lane.
    */
  private def genericTableDir(spark: SparkSession, sfDir: String): String =
    tableDirCache.getOrElseUpdate((spark.sparkContext.applicationId, s"g:$sfDir"), {
      val dir = "/tmp/graft-tables/g1-" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      GenericTable.encode(
        spark.read.parquet(s"$sfDir/documents.parquet"), dir,
        opts = GraftTable.Options(targetRowsPerBlock = 128))
      dir
    })

  /** TPC-H lineitem through the generic lane: 11 columns spanning int64,
    * int32, double (×4 — exercised by the f64_dec decimal-scaling codec),
    * string, and timestamp.
    */
  private def lineitemTableDir(spark: SparkSession, sfDir: String): String =
    tableDirCache.getOrElseUpdate((spark.sparkContext.applicationId, s"L:$sfDir"), {
      val dir = "/tmp/graft-tables/L1-" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      GenericTable.encode(
        spark.read.parquet(s"$sfDir/lineitem.parquet"), dir,
        keyCol = "l_orderkey",
        opts = GraftTable.Options(targetRowsPerBlock = 8192))
      dir
    })

  /** Schema-evolved generic table: documents ingested in two batches with
    * DIFFERENT schemas — rows `doc_id < 250` arrive before the `lang` and
    * `n_chars` columns existed; the rest carry all five. Old rows must
    * read null for the late columns (Iceberg-style evolution).
    */
  private def evolvedTableDir(spark: SparkSession, sfDir: String): String =
    tableDirCache.getOrElseUpdate((spark.sparkContext.applicationId, s"E:$sfDir"), {
      val dir = "/tmp/graft-tables/E1-" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val opts = GraftTable.Options(targetRowsPerBlock = 128)
      GenericTable.encode(
        docs.where(col("doc_id") < 250).select("doc_id", "text", "source"),
        dir, keyCol = "doc_id", opts)
      GenericTable.append(docs.where(col("doc_id") >= 250), dir, opts)
      dir
    })

  private val codecNames =
    Seq("plain", "bitpack", "for", "delta_for", "rle", "dict", "fsst", "pfor")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E2 tokenize: per-doc token counts + positional checksum
    "q_tokenize" -> ((s, dir) => {
      Tokenize.tokenTable(s, dir)
        .select(
          col("doc_id"),
          col("n_tok").cast("long").as("n_tok"),
          Tokenize.checksumCol(col("tokens")).as("checksum"),
          array_min(col("tokens")).cast("long").as("t_min"),
          array_max(col("tokens")).cast("long").as("t_max"))
        .orderBy(col("doc_id").cast("long"))
    }),

    // E2/E3 vocab discovery: distributed rank id assignment (Ranks — no
    // single-partition window), cached per (session, corpus)
    "q_vocab" -> ((s, dir) => {
      val entries = Tokenize.cachedVocab(s, dir)._1
      s.createDataFrame(entries.toIndexedSeq)
        .select(col("token_id"), col("word"), col("cnt"))
        .orderBy("word")
    }),

    // internal relational machinery: per-source aggregation over the
    // synthesized token table
    "q_source_stats" -> ((s, dir) => {
      Tokenize.tokenTable(s, dir).toDF()
        .groupBy("source")
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(col("n_tok").cast("long")).as("tokens"),
          min(col("n_tok")).cast("long").as("min_tok"),
          max(col("n_tok")).cast("long").as("max_tok"),
          sum(Tokenize.checksumCol(col("tokens"))).as("checksum_sum"))
        .orderBy("source")
    }),

    // E4+E10+E11: FULL pipeline — encode into the Iceberg-shaped table,
    // decode it back, aggregate the DECODED rows. Matching the oracle
    // (computed from raw documents) proves bit-identical round-trip
    // through block assembly, codecs, parquet, and manifest resume.
    "q_roundtrip_table" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      GraftTable.decode(s, tdir).toDF()
        .groupBy("source")
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(col("n_tok").cast("long")).as("tokens"),
          sum(Tokenize.checksumCol(col("tokens"))).as("checksum_sum"))
        .orderBy("source")
    }),

    // DSv2 WRITE path (ebenezer's sink parity): the token table written
    // through df.write.format("graft") and read back through
    // spark.read.format("graft") — the whole connector round trip must
    // reproduce the source exactly
    "q_datasource_write" -> ((s, dir) => {
      val tdir = tableDirCache.getOrElseUpdate(
        (s.sparkContext.applicationId, s"W:$dir"), {
          val d = "/tmp/graft-tables/W1-" + dir.replaceAll("[^A-Za-z0-9.]", "_")
          Tokenize.tokenTable(s, dir).toDF()
            .write.format("graft").option("targetRowsPerBlock", "128")
            .mode("overwrite").save(d)
          d
        })
      s.read.format("graft").load(tdir)
        .groupBy("source")
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(col("n_tok").cast("long")).as("tokens"),
          sum(Tokenize.checksumCol(col("tokens"))).as("checksum_sum"))
        .orderBy("source")
    }),

    // R3/R4 any-schema tables: documents.parquet (5 columns incl. lang and
    // n_chars — a schema the token lane would reject) encoded AS-IS through
    // the generic lane, decoded, and compared per-row via md5 of the
    // decoded text — bit-identical round-trip of an arbitrary schema
    "q_roundtrip_generic" -> ((s, dir) => {
      val tdir = genericTableDir(s, dir)
      GenericTable.decode(s, tdir)
        .select(
          col("doc_id").cast("long").as("doc_id"),
          col("lang"), col("source"),
          col("n_chars").cast("long").as("n_chars"),
          md5(encode(col("text"), "UTF-8")).as("text_md5"))
        .orderBy("doc_id")
    }),

    // Events table through the generic lane: timestamp_ntz (micros
    // arithmetic), doubles (f64_dec), strings — exact per-type aggregates
    // of the decoded table vs the source
    "q_roundtrip_events" -> ((s, dir) => {
      val tdir = tableDirCache.getOrElseUpdate(
        (s.sparkContext.applicationId, s"V:$dir"), {
          val d = "/tmp/graft-tables/V1-" + dir.replaceAll("[^A-Za-z0-9.]", "_")
          GenericTable.encode(
            s.read.parquet(s"$dir/events.parquet"), d, keyCol = "event_id",
            opts = GraftTable.Options(targetRowsPerBlock = 4096))
          d
        })
      // Outputs are engine-portable BIGINTs only (contract rule above):
      // doubles as exact micro-units, timestamps as epoch micros — the
      // driver's hash canonicalization renders DECIMAL(38,x)/TIMESTAMP_NTZ
      // parquet differently across engines even when values agree.
      GenericTable.decode(s, tdir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("n_events"),
          sum(col("user_id").cast("long")).cast("long").as("sum_user"),
          sum((col("value").cast("decimal(18,6)") * lit(1000000))
            .cast("long")).cast("long").as("sum_value_micros"),
          min(expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
            .cast("long").as("min_ts_us"),
          max(expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
            .cast("long").as("max_ts_us"))
        .orderBy("event_type")
    }),

    // Exact n-gram Jaccard (brute-force all-pairs) — the baseline twin of
    // q_dedup_minhash; identical output proves the LSH path loses nothing
    "q_dedup_jaccard" -> ((s, dir) => {
      Dedup.jaccardPairs(
        s.read.parquet(s"$dir/documents.parquet"), threshold = 0.9)
        .select(
          col("doc_a"), col("doc_b"),
          round(col("jaccard") * 1e6).cast("long").as("jaccard_ppm"))
        .orderBy(length(col("doc_a")), col("doc_a"),
          length(col("doc_b")), col("doc_b"))
    }),

    // Connected components over the exact near-dup pairs: transitive
    // closure via pointer-jumping min-label propagation — one canonical
    // doc per near-dup cluster (pairs alone cannot decide keep/drop when
    // A~B~C but A!~C). Oracle: DuckDB recursive CTE over the same
    // brute-force pair set.
    "q_dedup_clusters" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val out = Dedup.clusters(Dedup.jaccardPairs(docs, threshold = 0.9), docs)
        .select(
          col("doc_id").cast("long").as("doc_id"),
          col("cluster_id").cast("long").as("cluster_id"),
          col("cluster_size").cast("long").as("cluster_size"),
          when(col("is_canonical"), 1L).otherwise(0L).as("canonical"))
        .orderBy("doc_id")
      out
    }),

    // Time travel: the table exactly as of version 1 (before the second
    // ingest batch); the oracle recomputes v1's slice from the source
    "q_timetravel" -> ((s, dir) => {
      val tdir = evolvedTableDir(s, dir)
      GenericTable.decodeAt(s, tdir, 1)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(length(col("text")).cast("long")).cast("long").as("sum_text_len"))
        .orderBy("source")
    }),

    // Generic-lane range decode: key zone maps (key_min/key_max per block)
    // prune the lineitem table down to the orderkey slice before any
    // payload is decoded; the oracle recomputes the slice from the source
    "q_decode_range_generic" -> ((s, dir) => {
      val tdir = lineitemTableDir(s, dir)
      GenericTable.decodeRange(s, tdir, 1000L, 2000L)
        .agg(
          count(lit(1)).cast("long").as("n_rows"),
          sum(col("l_orderkey").cast("long")).cast("long").as("sum_okey"),
          sum((col("l_quantity").cast("decimal(18,2)") * lit(100))
            .cast("long")).cast("long").as("sum_qty_cents"))
    }),

    // Generic lane through the DSv2 connector: the same key slice, but via
    // spark.read.format("graft") — the BETWEEN on the table's range key is
    // pushed as a [lo, hi] interval onto the per-block key_min/key_max
    // zone-map columns (parquet row-group pruning, no driver id set)
    "q_datasource_generic" -> ((s, dir) => {
      val tdir = lineitemTableDir(s, dir)
      s.read.format("graft").load(tdir)
        .where(col("l_orderkey").between(1000L, 2000L))
        .agg(
          count(lit(1)).cast("long").as("n_rows"),
          sum(col("l_orderkey").cast("long")).cast("long").as("sum_okey"),
          sum((col("l_quantity").cast("decimal(18,2)") * lit(100))
            .cast("long")).cast("long").as("sum_qty_cents"))
    }),

    // list<struct> through the generic lane (the thrift repeated-struct
    // shape): each document's words become array<struct<i: int, w:
    // string>>, encode → decode must preserve every element, order, and
    // field — checked via a position-weighted digest per document
    "q_roundtrip_liststruct" -> ((s, dir) => {
      val tdir = tableDirCache.getOrElseUpdate(
        (s.sparkContext.applicationId, s"S:$dir"), {
          val d = "/tmp/graft-tables/S1-" + dir.replaceAll("[^A-Za-z0-9.]", "_")
          GenericTable.encode(
            s.read.parquet(s"$dir/documents.parquet")
              .select(
                col("doc_id").cast("long").as("doc_id"),
                expr("transform(split(text, ' '), (w, i) -> named_struct('i', i, 'w', w))")
                  .as("xs")),
            d, keyCol = "doc_id",
            opts = GraftTable.Options(targetRowsPerBlock = 128))
          d
        })
      GenericTable.decode(s, tdir)
        .select(
          col("doc_id").cast("long").as("doc_id"),
          expr("aggregate(xs, 0L, (a, x) -> a + (x.i + 1) * length(x.w))")
            .cast("long").as("wsum"),
          size(col("xs")).cast("long").as("n"))
        .orderBy("doc_id")
    }),

    // Copy-on-write deletes: a key-range delete (manifest-span pruned)
    // then a predicate delete (column-pruned detection scan) on an
    // encoded documents table; the decoded survivors must equal the raw
    // table minus exactly the deleted rows
    "q_delete_cow" -> ((s, dir) => {
      val tdir = tableDirCache.getOrElseUpdate(
        (s.sparkContext.applicationId, s"DL:$dir"), {
          val d = "/tmp/graft-tables/DL-" + dir.replaceAll("[^A-Za-z0-9.]", "_")
          GenericTable.encode(
            s.read.parquet(s"$dir/documents.parquet"), d, keyCol = "doc_id",
            opts = GraftTable.Options(targetRowsPerBlock = 128))
          GenericTable.deleteRange(s, d, 100L, 149L)
          GenericTable.deleteWhere(s, d, col("lang") === "de")
          d
        })
      GenericTable.decode(s, tdir)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          sum(length(col("text")).cast("long")).cast("long").as("sum_len"))
        .orderBy("source")
    }),

    // Merge-by-key (upsert): rows 50..59 re-ingested with a replaced
    // lang, ten brand-new docs appended — the decoded table must equal
    // the raw table with exactly those rows replaced/added
    "q_upsert" -> ((s, dir) => {
      val tdir = tableDirCache.getOrElseUpdate(
        (s.sparkContext.applicationId, s"UP:$dir"), {
          val d = "/tmp/graft-tables/UP-" + dir.replaceAll("[^A-Za-z0-9.]", "_")
          val docs = s.read.parquet(s"$dir/documents.parquet")
          GenericTable.encode(docs, d, keyCol = "doc_id",
            opts = GraftTable.Options(targetRowsPerBlock = 128))
          val batch = docs.where(col("doc_id").between(50L, 59L))
            .withColumn("lang", lit("xx"))
            .unionByName(docs.where(col("doc_id") < 10L)
              .withColumn("doc_id", col("doc_id") + 100000L)
              .withColumn("lang", lit("zz")))
          GenericTable.upsertByKey(batch, d,
            GraftTable.Options(targetRowsPerBlock = 128))
          d
        })
      GenericTable.decode(s, tdir)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          sum(col("doc_id")).cast("long").as("sum_ids"))
        .orderBy("lang")
    }),

    // Arbitrary-depth nesting through the generic lane: each document
    // becomes a depth-3 int array (per word: [[length, 1-based pos]]) plus
    // a list<map> ([map(lang -> n_chars), map()]); encode → decode must
    // preserve every level — checked via an order-sensitive positional
    // digest, the map entry, and the empty-map size
    "q_roundtrip_deepnest" -> ((s, dir) => {
      val tdir = tableDirCache.getOrElseUpdate(
        (s.sparkContext.applicationId, s"D3:$dir"), {
          val d = "/tmp/graft-tables/D3-" + dir.replaceAll("[^A-Za-z0-9.]", "_")
          GenericTable.encode(
            s.read.parquet(s"$dir/documents.parquet")
              .select(
                col("doc_id").cast("long").as("doc_id"),
                expr("transform(split(text, ' '), (w, i) -> " +
                  "array(array(CAST(length(w) AS INT), CAST(i + 1 AS INT))))")
                  .as("a3"),
                expr("array(map(lang, CAST(n_chars AS INT)), map())").as("lm")),
            d, keyCol = "doc_id",
            opts = GraftTable.Options(targetRowsPerBlock = 128))
          d
        })
      GenericTable.decode(s, tdir)
        .select(
          col("doc_id").cast("long").as("doc_id"),
          expr("CAST(aggregate(a3, 0L, (a, e) -> a + CAST(e[0][1] AS BIGINT) * " +
            "(CAST(e[0][0] AS BIGINT) * 31 + CAST(e[0][1] AS BIGINT))) AS BIGINT)")
            .as("d3"),
          size(col("a3")).cast("long").as("n"),
          expr("CAST(element_at(map_values(lm[0]), 1) AS BIGINT)").as("m1"),
          expr("CAST(length(element_at(map_keys(lm[0]), 1)) AS BIGINT)").as("klen"),
          expr("CAST(size(lm[1]) AS BIGINT)").as("e0"))
        .orderBy("doc_id")
    }),

    // DataSource V2 read path: the same encoded table consumed via
    // spark.read.format("graft") with a pushed source filter — the filter
    // prunes blocks through the manifest src_list zone maps at plan time,
    // the projection prunes payload columns, and the result must still be
    // exactly what the raw documents imply
    "q_datasource" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      s.read.format("graft").load(tdir)
        .where(col("source").isin("src1", "src2"))
        .groupBy("source")
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(col("n_tok").cast("long")).as("tokens"),
          sum(Tokenize.checksumCol(col("tokens"))).as("checksum_sum"))
        .orderBy("source")
    }),

    // Schema evolution: documents ingested as two batches with different
    // schemas (lang/n_chars added mid-stream); rows that predate a column
    // must read null for it, everything else must survive bit-identically
    "q_schema_evolution" -> ((s, dir) => {
      val tdir = evolvedTableDir(s, dir)
      GenericTable.decode(s, tdir)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("lang").isNull, 1L).otherwise(0L)).cast("long")
            .as("pre_evolution_docs"),
          sum(coalesce(col("n_chars"), lit(0L))).cast("long").as("sum_chars"),
          sum(length(col("text")).cast("long")).cast("long").as("sum_text_len"))
        .orderBy("source")
    }),

    // Generic lane over TPC-H lineitem: the four double columns ride the
    // f64_dec decimal-scaling codec (scaled-integer + raw-bit exceptions);
    // exact decimal aggregates of the DECODED table must equal the same
    // aggregates of the source — only a bit-identical double decode can
    // produce identical cent-level decimal casts on every row
    "q_roundtrip_lineitem" -> ((s, dir) => {
      val tdir = lineitemTableDir(s, dir)
      // Cents / epoch-micros BIGINTs for portability (see q_roundtrip_events)
      GenericTable.decode(s, tdir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).cast("long").as("n_rows"),
          sum((col("l_quantity").cast("decimal(18,2)") * lit(100))
            .cast("long")).cast("long").as("sum_qty_cents"),
          sum((col("l_extendedprice").cast("decimal(18,2)") * lit(100))
            .cast("long")).cast("long").as("sum_price_cents"),
          sum((col("l_discount").cast("decimal(18,2)") * lit(100))
            .cast("long")).cast("long").as("sum_disc_cents"),
          sum((col("l_tax").cast("decimal(18,2)") * lit(100))
            .cast("long")).cast("long").as("sum_tax_cents"),
          sum(col("l_orderkey").cast("long")).cast("long").as("sum_okey"),
          min(expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', l_shipdate)"))
            .cast("long").as("min_ship_us"),
          max(expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', l_shipdate)"))
            .cast("long").as("max_ship_us"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // E11 verify as a query: decoded ⋈ source equi-join, mismatches must
    // be zero (the oracle asserts the constant — reachable only if the
    // engine's decode is bit-identical for every row)
    "q_verify_mismatch" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      val src = Tokenize.tokenTable(s, dir).toDF().alias("s")
      val dec = GraftTable.decode(s, tdir).toDF().alias("d")
      dec.join(src, "doc_id")
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(when(col("d.tokens") <=> col("s.tokens") and
            (col("d.source") <=> col("s.source")) and
            (col("d.n_tok") <=> col("s.n_tok")), 0L).otherwise(1L))
            .as("mismatches"))
    }),

    // E8a–E8e: every codec family forced over every row, decoded, and
    // checksummed — one result row per codec, all equal to the source
    "q_codec_roundtrip" -> ((s, dir) => {
      val base = Tokenize.tokenTable(s, dir).toDF()
      codecNames.map { c =>
        base.select(
          lit(c).as("codec"),
          col("n_tok"),
          graft_decode(graft_encode(col("tokens"), c)).as("decoded"))
          .agg(
            first(lit(c)).as("codec"),
            count(lit(1)).cast("long").as("docs"),
            sum(size(col("decoded")).cast("long")).as("tokens"),
            sum(Tokenize.checksumCol(col("decoded"))).as("checksum_sum"))
      }.reduce(_ unionAll _).orderBy("codec")
    }),

    // E4/E16: per-block manifest (codec selection evidence, lineage,
    // sizes). Not SQL-expressible (block bounds come from sampled
    // quantiles) → rows-only check.
    "q_block_manifest" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      GraftTable.readManifest(s, tdir)
        .select(
          col("block_id").cast("long").as("block_id"),
          col("ver").cast("long").as("ver"),
          col("row_count").cast("long").as("row_count"),
          col("token_count").cast("long").as("token_count"),
          col("doc_id_min"), col("doc_id_max"),
          col("codec_doc_id"), col("codec_tokens"),
          col("codec_n_tok"), col("codec_source"),
          col("bytes_total").cast("long").as("bytes_total"),
          col("plain_bytes").cast("long").as("plain_bytes"),
          col("dict_hash_tokens"))
        .orderBy("block_id")
    }),

    // ---- training-pipeline ops (documents / embeddings tables) ----

    // exact dedup: digest groupBy + keep-first ranking
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exact(s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("string"), col("text")))
        .orderBy(length(col("doc_id")), col("doc_id"))
    }),

    // MinHash-LSH near-dup pairs, verified by exact Jaccard; the oracle is
    // the brute-force shingle-set Jaccard — equality proves LSH recall
    "q_dedup_minhash" -> ((s, dir) => {
      Dedup.minHashLsh(
        s.read.parquet(s"$dir/documents.parquet"), threshold = 0.9)
        .select(
          col("doc_a"), col("doc_b"),
          round(col("jaccard") * 1e6).cast("long").as("jaccard_ppm"))
        .orderBy(length(col("doc_a")), col("doc_a"),
          length(col("doc_b")), col("doc_b"))
    }),

    // SimHash near-dup pairs, hash-checked: at maxHamming = 0 a pair means
    // sketch EQUALITY, and identical texts always sketch-collide, so on a
    // corpus slice with no accidental sketch collisions the output is
    // exactly the identical-text pair set — which DuckDB recomputes without
    // knowing the sketch. The full corpus at sf0.01 has two genuine
    // near-dup collisions (166/323, 435/486 — correct SimHash behaviour,
    // but engine-defined); the doc_id < 250 slice excludes both (restricting
    // the corpus can only REMOVE sketch-equality pairs, never add), so the
    // oracle equality is exact. Full-corpus + hamming>0 behaviour is
    // spec-covered (OpsSpec).
    "q_dedup_simhash" -> ((s, dir) => {
      val half = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") < 250)
      Dedup.simHash(
        half.select(col("doc_id").cast("string"), col("text"))
          .unionAll(half.where(col("doc_id") < 3)
            .select(concat(lit("9"), col("doc_id")).as("doc_id"), col("text"))),
        maxHamming = 0)
        .orderBy("doc_a", "doc_b")
    }),

    // embedding near-dup pairs, brute-force cosine (exact baseline)
    "q_embed_pairs" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val a = emb.alias("a")
      val b = emb.alias("b")
      a.crossJoin(b)
        .where(col("a.vec_id") < col("b.vec_id"))
        .where(Similarity.cosine(col("a.embedding"), col("b.embedding")) >= 0.46)
        .select(
          col("a.vec_id").cast("long").as("vec_a"),
          col("b.vec_id").cast("long").as("vec_b"))
        .orderBy("vec_a", "vec_b")
    }),

    // ANN baseline: brute-force cosine top-5 for the first 10 vectors
    "q_ann_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("rank"), col("vec_id"))
        .orderBy("query_id", "rank")
    }),

    // the SCALE ANN path: banded hyperplane LSH top-k must EQUAL the exact
    // brute-force top-k on this corpus (the oracle recomputes brute force —
    // equality proves candidate recall at the default band width)
    "q_ann_lsh" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("rank"), col("vec_id"))
        .orderBy("query_id", "rank")
    }),

    // the SCALE near-dup path: banded-LSH pair generation must EQUAL the
    // brute-force cosine pairs at the same threshold
    "q_embed_neardup_lsh" -> ((s, dir) => {
      Dedup.embeddingNearDup(
        s.read.parquet(s"$dir/embeddings.parquet"),
        threshold = 0.46, bands = 16, rowsPerBand = 2)
        .select(col("vec_a"), col("vec_b"))
        .orderBy("vec_a", "vec_b")
    }),

    // IVF plumbing exactness: probing every list must reproduce exact
    // brute-force top-k bit for bit (index build → assignment → probe join
    // → ranking all lossless); approximate-recall behaviour is covered by
    // OpsSpec (this corpus is near-isotropic noise, so partial-probe recall
    // is structurally weak on it — see the spec comment)
    "q_ann_ivf" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val idx = Ivf.build(emb, numCentroids = 22)
      Ivf.topK(idx, emb.where(col("vec_id") < 10), k = 5, nprobe = 22)
        .select(col("query_id"), col("rank"), col("vec_id"))
        .orderBy("query_id", "rank")
    }),

    // text quality signals (ratios as ppm integers: engine-exact compare)
    "q_text_quality" -> ((s, dir) => {
      TextAnalysis.quality(s.read.parquet(s"$dir/documents.parquet"))
        .select(
          col("doc_id"), col("n_words"), col("n_distinct"),
          col("n_chars"), col("n_stop"),
          round(col("distinct_ratio") * 1e6).cast("long").as("distinct_ppm"),
          round(col("stop_ratio") * 1e6).cast("long").as("stop_ppm"),
          col("quality_ok"))
        .orderBy(length(col("doc_id")), col("doc_id"))
    }),

    // token counting: whitespace + BPE-ish regex
    "q_token_count" -> ((s, dir) => {
      TextAnalysis.tokenCounts(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy(length(col("doc_id")), col("doc_id"))
    }),

    // corpus-trained language id (integer scoring → exact argmax)
    "q_langid" -> ((s, dir) => {
      TextAnalysis.langId(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy(length(col("doc_id")), col("doc_id"))
    }),

    // order-sensitive rolling fingerprint
    "q_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprint(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy(length(col("doc_id")), col("doc_id"))
    }),

    // E14: explicit salted two-phase aggregation (skew machinery) — result
    // must equal a plain groupBy count, which is exactly what the oracle is
    "q_skew_salted" -> ((s, dir) => {
      graft.table.Skew.saltedKeyCounts(
        s.read.parquet(s"$dir/documents.parquet"),
        col("source"), col("doc_id"))
        .select(col("key").as("source"), col("cnt").cast("long").as("cnt"))
        .orderBy("source")
    }),

    // metadata-only statistics: answered ENTIRELY from the manifest (zone
    // maps) — zero payload bytes read; the oracle recomputes the same
    // numbers from the raw documents
    "q_meta_stats" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      GraftTable.readManifest(s, tdir)
        .agg(
          sum(col("row_count")).cast("long").as("docs"),
          sum(col("token_count")).cast("long").as("tokens"),
          min(col("tok_min")).cast("long").as("t_min"),
          max(col("tok_max")).cast("long").as("t_max"))
    }),

    // manifest invariants as a hash-checked oracle entry (VERDICT r1 item
    // 7): row/token/plain-byte totals and id bounds summed from the
    // manifest must equal the same totals recomputed from raw documents —
    // plain_bytes is deterministic (len(doc_id)+len(source)+4+4·n_tok)
    "q_manifest_totals" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      GraftTable.readManifest(s, tdir)
        .agg(
          sum("row_count").cast("long").as("docs"),
          sum("token_count").cast("long").as("tokens"),
          sum("plain_bytes").cast("long").as("plain_bytes"),
          min(expr("try_cast(doc_id_min as bigint)")).cast("long").as("id_min"),
          max(expr("try_cast(doc_id_max as bigint)")).cast("long").as("id_max"))
    }),

    // E10 + manifest pruning: decode only a doc_id range (block-level
    // elimination via manifest min/max + exact row filter)
    "q_decode_range" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      GraftTable.decodeRange(s, tdir, 100L, 150L).toDF()
        .select(
          col("doc_id"),
          col("n_tok").cast("long").as("n_tok"),
          Tokenize.checksumCol(col("tokens")).as("checksum"),
          col("source"))
        .orderBy(col("doc_id").cast("long"))
    }),

    // source zone maps: decode only one source's rows — block-level
    // pruning via the manifest's per-block distinct-source list + exact
    // row filter; the oracle recomputes the slice from raw documents
    "q_decode_source" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      GraftTable.decodeWhere(s, tdir, Seq("src3")).toDF()
        .select(
          col("doc_id"),
          col("n_tok").cast("long").as("n_tok"),
          Tokenize.checksumCol(col("tokens")).as("checksum"),
          col("source"))
        .orderBy(col("doc_id").cast("long"))
    }),

    // column-pruned decode: tokens reconstructed WITHOUT reading the
    // string payloads (PlanSpec asserts the pruned ReadSchema); totals
    // must equal the raw documents
    "q_decode_tokens" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      GraftTable.decodeSelect(s, tdir, Seq("tokens"))
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(size(col("tokens")).cast("long")).as("tokens"),
          sum(Tokenize.checksumCol(col("tokens"))).as("checksum_sum"))
    }),

    // R7/R8: DURABLE catalog registration + spark.sql over the DECODED
    // view — the Hive-delegation analogue (the registration survives into
    // new sessions via the catalog file); oracle recomputes from raw docs
    "q_sql_view" -> ((s, dir) => {
      val tdir = encodedTableDir(s, dir)
      graft.table.GraftCatalog.register(s, s"$tdir/catalog", "graft", tdir)
      s.sql(
        """SELECT source,
          |       CAST(count(*) AS BIGINT) AS docs,
          |       CAST(sum(n_tok) AS BIGINT) AS tokens,
          |       CAST(min(n_tok) AS BIGINT) AS min_tok,
          |       CAST(max(n_tok) AS BIGINT) AS max_tok
          |FROM graft
          |GROUP BY source
          |ORDER BY source""".stripMargin)
    }),

    // R9/E3: introspection — per-(column, codec) selection evidence
    "q_describe" -> ((s, dir) => {
      GraftTable.describe(s, encodedTableDir(s, dir))
        .select(col("column"), col("codec"),
          col("blocks").cast("long").as("blocks"),
          col("bytes").cast("long").as("bytes"))
        .orderBy("column", "codec")
    }),

    // R9 completion: GENERIC parquet introspection — schema + per-column
    // stats over an arbitrary (non-graft) table, here TPC-H lineitem
    "q_describe_any" -> ((s, dir) => {
      GraftTable.describeAny(s, s"$dir/lineitem.parquet")
        .select(col("column"),
          col("cnt").cast("long").as("cnt"),
          col("nulls").cast("long").as("nulls"),
          col("min_str"), col("max_str"))
        .orderBy("column")
    }),

    // multimodal plumbing: synthetic media payloads → stub decode; header
    // fields and body bytes are pure functions of n_chars/text, so DuckDB
    // can recompute them without touching the binary
    "q_media_probe" -> ((s, dir) => {
      graft.ops.Multimodal.pipeline(
        graft.ops.Multimodal.syntheticMedia(s.read.parquet(s"$dir/documents.parquet")))
        .select(
          col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("body_bytes").cast("long").as("body_bytes"),
          col("frames_kept").cast("long").as("frames_kept"))
        .orderBy(length(col("doc_id")), col("doc_id"))
    }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_tokenize" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents
        |)
        |SELECT CAST(p.doc_id AS VARCHAR) AS doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tok,
        |       CAST(sum(v.tid * p.pos) AS BIGINT) AS checksum,
        |       CAST(min(v.tid) AS BIGINT) AS t_min,
        |       CAST(max(v.tid) AS BIGINT) AS t_max
        |FROM pairs p JOIN vocab v ON v.word = p.word
        |GROUP BY p.doc_id
        |ORDER BY CAST(p.doc_id AS BIGINT)""".stripMargin,

    "q_vocab" ->
      """WITH words AS (SELECT unnest(string_split(text,' ')) AS word FROM documents)
        |SELECT CAST(row_number() OVER (ORDER BY word) - 1 AS BIGINT) AS token_id,
        |       word,
        |       CAST(cnt AS BIGINT) AS cnt
        |FROM (SELECT word, count(*) AS cnt FROM words GROUP BY word)
        |ORDER BY word""".stripMargin,

    "q_source_stats" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, source, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents
        |), per_doc AS (
        |  SELECT p.doc_id, p.source, count(*) AS n_tok, sum(v.tid * p.pos) AS checksum
        |  FROM pairs p JOIN vocab v ON v.word = p.word
        |  GROUP BY p.doc_id, p.source
        |)
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(n_tok) AS BIGINT) AS tokens,
        |       CAST(min(n_tok) AS BIGINT) AS min_tok,
        |       CAST(max(n_tok) AS BIGINT) AS max_tok,
        |       CAST(sum(checksum) AS BIGINT) AS checksum_sum
        |FROM per_doc
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // proves the engine's decoded table equals the raw source: the oracle
    // recomputes the same per-source aggregates from documents directly
    "q_roundtrip_table" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, source, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents
        |), per_doc AS (
        |  SELECT p.doc_id, p.source, count(*) AS n_tok, sum(v.tid * p.pos) AS checksum
        |  FROM pairs p JOIN vocab v ON v.word = p.word
        |  GROUP BY p.doc_id, p.source
        |)
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(n_tok) AS BIGINT) AS tokens,
        |       CAST(sum(checksum) AS BIGINT) AS checksum_sum
        |FROM per_doc
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_datasource_write" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, source, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents
        |), per_doc AS (
        |  SELECT p.doc_id, p.source, count(*) AS n_tok, sum(v.tid * p.pos) AS checksum
        |  FROM pairs p JOIN vocab v ON v.word = p.word
        |  GROUP BY p.doc_id, p.source
        |)
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(n_tok) AS BIGINT) AS tokens,
        |       CAST(sum(checksum) AS BIGINT) AS checksum_sum
        |FROM per_doc
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_roundtrip_generic" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
        |       CAST(n_chars AS BIGINT) AS n_chars,
        |       md5(text) AS text_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_roundtrip_events" ->
      """SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(SUM(user_id) AS BIGINT) AS sum_user,
        |       CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT)
        |         AS sum_value_micros,
        |       CAST(epoch_us(MIN(ts)) AS BIGINT) AS min_ts_us,
        |       CAST(epoch_us(MAX(ts)) AS BIGINT) AS max_ts_us
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_dedup_jaccard" ->
      """WITH sh AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
        |         list_distinct([array_to_string(list_slice(string_split(text,' '), i, i+2), ' ')
        |           for i in range(1, greatest(len(string_split(text,' '))-2, 1)+1)]) AS s
        |  FROM documents
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(round(1000000.0 * (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |         / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE))) AS BIGINT) AS jaccard_ppm
        |FROM sh a JOIN sh b
        |  ON (length(a.doc_id) < length(b.doc_id)
        |      OR (length(a.doc_id) = length(b.doc_id) AND a.doc_id < b.doc_id))
        |WHERE (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |       / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE)) >= 0.9
        |ORDER BY length(doc_a), doc_a, length(doc_b), doc_b""".stripMargin,

    "q_timetravel" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
        |FROM documents
        |WHERE doc_id < 250
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_decode_range_generic" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
        |       CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |         AS sum_qty_cents
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 2000""".stripMargin,

    "q_roundtrip_liststruct" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |       CAST(SUM(pos * length(word)) AS BIGINT) AS wsum,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_upsert" ->
      """WITH up AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id BETWEEN 50 AND 59 THEN 'xx' ELSE lang END AS lang,
        |         n_chars
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, 'zz', n_chars FROM documents WHERE doc_id < 10
        |)
        |SELECT lang,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM up
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "q_delete_cow" ->
      """SELECT source,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(SUM(length(text)) AS BIGINT) AS sum_len
        |FROM documents
        |WHERE NOT (doc_id BETWEEN 100 AND 149) AND lang <> 'de'
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_dedup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
        |         list_distinct([array_to_string(list_slice(string_split(text,' '), i, i+2), ' ')
        |           for i in range(1, greatest(len(string_split(text,' '))-2, 1)+1)]) AS s
        |  FROM documents
        |),
        |prs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b
        |    ON (length(a.doc_id) < length(b.doc_id)
        |        OR (length(a.doc_id) = length(b.doc_id) AND a.doc_id < b.doc_id))
        |  WHERE (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |         / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE)) >= 0.9
        |),
        |edges AS (
        |  SELECT doc_a AS v, doc_b AS w FROM prs
        |  UNION
        |  SELECT doc_b AS v, doc_a AS w FROM prs
        |),
        |reach AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS v, CAST(doc_id AS VARCHAR) AS r
        |  FROM documents
        |  UNION
        |  SELECT e.v, reach.r FROM edges e JOIN reach ON reach.v = e.w
        |),
        |lbl AS (SELECT v, MIN(CAST(r AS BIGINT)) AS cid FROM reach GROUP BY v),
        |sz AS (SELECT cid, COUNT(*) AS n FROM lbl GROUP BY cid)
        |SELECT CAST(lbl.v AS BIGINT) AS doc_id,
        |       CAST(lbl.cid AS BIGINT) AS cluster_id,
        |       CAST(sz.n AS BIGINT) AS cluster_size,
        |       CAST(CASE WHEN CAST(lbl.v AS BIGINT) = lbl.cid THEN 1 ELSE 0 END
        |         AS BIGINT) AS canonical
        |FROM lbl JOIN sz ON lbl.cid = sz.cid
        |ORDER BY doc_id""".stripMargin,

    "q_roundtrip_deepnest" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |       CAST(SUM(pos * (length(word) * 31 + pos)) AS BIGINT) AS d3,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(MAX(n_chars) AS BIGINT) AS m1,
        |       CAST(MAX(length(lang)) AS BIGINT) AS klen,
        |       CAST(0 AS BIGINT) AS e0
        |FROM (
        |  SELECT doc_id, n_chars, lang,
        |         unnest(string_split(text, ' ')) AS word,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_datasource_generic" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
        |       CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |         AS sum_qty_cents
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 2000""".stripMargin,

    "q_datasource" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, source, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents
        |), per_doc AS (
        |  SELECT p.doc_id, p.source, count(*) AS n_tok, sum(v.tid * p.pos) AS checksum
        |  FROM pairs p JOIN vocab v ON v.word = p.word
        |  GROUP BY p.doc_id, p.source
        |)
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(n_tok) AS BIGINT) AS tokens,
        |       CAST(sum(checksum) AS BIGINT) AS checksum_sum
        |FROM per_doc
        |WHERE source IN ('src1', 'src2')
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_schema_evolution" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS pre_evolution_docs,
        |       CAST(SUM(CASE WHEN doc_id >= 250 THEN n_chars ELSE 0 END) AS BIGINT)
        |         AS sum_chars,
        |       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_roundtrip_lineitem" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |         AS sum_qty_cents,
        |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |         AS sum_price_cents,
        |       CAST(SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |         AS sum_disc_cents,
        |       CAST(SUM(CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |         AS sum_tax_cents,
        |       CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
        |       CAST(epoch_us(MIN(l_shipdate)) AS BIGINT) AS min_ship_us,
        |       CAST(epoch_us(MAX(l_shipdate)) AS BIGINT) AS max_ship_us
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_verify_mismatch" ->
      """SELECT CAST(count(*) AS BIGINT) AS docs,
        |       CAST(0 AS BIGINT) AS mismatches
        |FROM documents""".stripMargin,

    "q_codec_roundtrip" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents
        |), per_doc AS (
        |  SELECT p.doc_id, count(*) AS n_tok, sum(v.tid * p.pos) AS checksum
        |  FROM pairs p JOIN vocab v ON v.word = p.word
        |  GROUP BY p.doc_id
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS docs,
        |         CAST(sum(n_tok) AS BIGINT) AS tokens,
        |         CAST(sum(checksum) AS BIGINT) AS checksum_sum
        |  FROM per_doc
        |)
        |SELECT c.codec, t.docs, t.tokens, t.checksum_sum
        |FROM (VALUES ('plain'),('bitpack'),('for'),('delta_for'),('rle'),('dict'),('fsst'),('pfor')) c(codec)
        |CROSS JOIN tot t
        |ORDER BY c.codec""".stripMargin,

    "q_dedup_exact" ->
      """SELECT CAST(doc_id AS VARCHAR) AS doc_id,
        |       CAST(count(*) OVER (PARTITION BY text) AS BIGINT) AS group_size,
        |       CAST(row_number() OVER (PARTITION BY text
        |         ORDER BY length(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) AS BIGINT) AS rank_in_group,
        |       (row_number() OVER (PARTITION BY text
        |         ORDER BY length(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) > 1) AS is_dup
        |FROM documents
        |ORDER BY length(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)""".stripMargin,

    "q_dedup_minhash" ->
      """WITH sh AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
        |         list_distinct([array_to_string(list_slice(string_split(text,' '), i, i+2), ' ')
        |           for i in range(1, greatest(len(string_split(text,' '))-2, 1)+1)]) AS s
        |  FROM documents
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(round(1000000.0 * (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |         / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE))) AS BIGINT) AS jaccard_ppm
        |FROM sh a JOIN sh b
        |  ON (length(a.doc_id) < length(b.doc_id)
        |      OR (length(a.doc_id) = length(b.doc_id) AND a.doc_id < b.doc_id))
        |WHERE (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |       / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE)) >= 0.9
        |ORDER BY length(doc_a), doc_a, length(doc_b), doc_b""".stripMargin,

    "q_dedup_simhash" ->
      """WITH t AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text
        |  FROM documents WHERE doc_id < 250
        |  UNION ALL
        |  SELECT '9' || CAST(doc_id AS VARCHAR), text
        |  FROM documents WHERE doc_id < 3
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(0 AS BIGINT) AS hamming
        |FROM t a JOIN t b ON a.text = b.text
        |  AND (length(a.doc_id) < length(b.doc_id)
        |       OR (length(a.doc_id) = length(b.doc_id) AND a.doc_id < b.doc_id))
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_embed_pairs" ->
      """SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.46
        |ORDER BY vec_a, vec_b""".stripMargin,

    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS c
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS BIGINT) AS rank,
        |       CAST(vec_id AS BIGINT) AS vec_id
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // the LSH top-k must equal exact brute force (recall proof)
    "q_ann_lsh" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS c
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS BIGINT) AS rank,
        |       CAST(vec_id AS BIGINT) AS vec_id
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // IVF at nprobe = numCentroids is exhaustive → equals brute force
    "q_ann_ivf" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS c
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS BIGINT) AS rank,
        |       CAST(vec_id AS BIGINT) AS vec_id
        |FROM scored
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // the banded-LSH pair set must equal brute-force cosine pairs
    "q_embed_neardup_lsh" ->
      """SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.46
        |ORDER BY vec_a, vec_b""".stripMargin,

    "q_manifest_totals" ->
      """SELECT CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(len(string_split(text,' '))) AS BIGINT) AS tokens,
        |       CAST(sum(length(CAST(doc_id AS VARCHAR)) + length(source)
        |                + 4 + 4 * len(string_split(text,' '))) AS BIGINT) AS plain_bytes,
        |       CAST(min(CAST(doc_id AS BIGINT)) AS BIGINT) AS id_min,
        |       CAST(max(CAST(doc_id AS BIGINT)) AS BIGINT) AS id_max
        |FROM documents""".stripMargin,

    // generic introspection over lineitem: the oracle recomputes the same
    // per-column stats (min/max only for engine-portable types). The
    // correctness pass runs at sf0.01, hence the pinned path.
    "q_describe_any" ->
      (Seq(
        ("l_orderkey", true), ("l_partkey", true), ("l_suppkey", true),
        ("l_linenumber", true), ("l_quantity", false), ("l_extendedprice", false),
        ("l_discount", false), ("l_tax", false), ("l_returnflag", true),
        ("l_linestatus", true), ("l_shipdate", false))
        .sortBy(_._1)
        .map { case (c, portable) =>
          val minMax =
            if (portable) s"CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str"
            else "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
          s"""SELECT '$c' AS "column", CAST(count($c) AS BIGINT) AS cnt,
             |  CAST(count(*) - count($c) AS BIGINT) AS nulls, $minMax
             |FROM lineitem""".stripMargin
        }
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")),

    "q_text_quality" ->
      """WITH t AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
        |         string_split(text, ' ') AS ws,
        |         length(text) AS n_chars
        |  FROM documents
        |)
        |SELECT doc_id,
        |       CAST(len(ws) AS BIGINT) AS n_words,
        |       CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
        |       CAST(n_chars AS BIGINT) AS n_chars,
        |       CAST(len(list_filter(ws, w -> w IN ('the','a'))) AS BIGINT) AS n_stop,
        |       CAST(round(1000000.0 * (CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE))) AS BIGINT) AS distinct_ppm,
        |       CAST(round(1000000.0 * (CAST(len(list_filter(ws, w -> w IN ('the','a'))) AS DOUBLE) / CAST(len(ws) AS DOUBLE))) AS BIGINT) AS stop_ppm,
        |       (len(ws) >= 10
        |         AND (CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE)) >= 0.2
        |         AND (CAST(len(list_filter(ws, w -> w IN ('the','a'))) AS DOUBLE) / CAST(len(ws) AS DOUBLE)) <= 0.5) AS quality_ok
        |FROM t
        |ORDER BY length(doc_id), doc_id""".stripMargin,

    "q_token_count" ->
      """SELECT CAST(doc_id AS VARCHAR) AS doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents
        |ORDER BY length(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)""".stripMargin,

    "q_langid" ->
      """WITH words AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang,
        |         unnest(string_split(text, ' ')) AS word
        |  FROM documents
        |), model AS (
        |  SELECT word, lang AS cand_lang, count(*) AS w_cnt
        |  FROM words GROUP BY word, lang
        |), scored AS (
        |  SELECT w.doc_id, w.lang, m.cand_lang, CAST(sum(m.w_cnt) AS BIGINT) AS score
        |  FROM words w JOIN model m ON w.word = m.word
        |  GROUP BY w.doc_id, w.lang, m.cand_lang
        |)
        |SELECT doc_id, lang AS lang_actual, cand_lang AS lang_pred, score,
        |       (cand_lang = lang) AS hit
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand_lang) = 1
        |ORDER BY length(doc_id), doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT CAST(doc_id AS VARCHAR) AS doc_id,
        |       CAST(list_reduce(
        |         list_prepend(CAST(0 AS BIGINT),
        |           [CAST((ascii(substring(w,1,1))*131 + ascii(substring(reverse(w),1,1))*31 + length(w)) % 2147483647 AS BIGINT)
        |            for w in string_split(text, ' ')]),
        |         (acc, x) -> (acc * 31 + x) % 2147483647) AS BIGINT) AS fingerprint
        |FROM documents
        |ORDER BY length(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)""".stripMargin,

    "q_skew_salted" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS cnt
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_meta_stats" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents
        |)
        |SELECT CAST(count(DISTINCT p.doc_id) AS BIGINT) AS docs,
        |       CAST(count(*) AS BIGINT) AS tokens,
        |       CAST(min(v.tid) AS BIGINT) AS t_min,
        |       CAST(max(v.tid) AS BIGINT) AS t_max
        |FROM pairs p JOIN vocab v ON v.word = p.word""".stripMargin,

    "q_decode_range" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, source, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents WHERE doc_id BETWEEN 100 AND 150
        |)
        |SELECT CAST(p.doc_id AS VARCHAR) AS doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tok,
        |       CAST(sum(v.tid * p.pos) AS BIGINT) AS checksum,
        |       any_value(p.source) AS source
        |FROM pairs p JOIN vocab v ON v.word = p.word
        |GROUP BY p.doc_id
        |ORDER BY CAST(p.doc_id AS BIGINT)""".stripMargin,

    "q_decode_source" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, source, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents WHERE source = 'src3'
        |)
        |SELECT CAST(p.doc_id AS VARCHAR) AS doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tok,
        |       CAST(sum(v.tid * p.pos) AS BIGINT) AS checksum,
        |       any_value(p.source) AS source
        |FROM pairs p JOIN vocab v ON v.word = p.word
        |GROUP BY p.doc_id
        |ORDER BY CAST(p.doc_id AS BIGINT)""".stripMargin,

    "q_decode_tokens" ->
      """WITH vocab AS (
        |  SELECT word, row_number() OVER (ORDER BY word) - 1 AS tid
        |  FROM (SELECT DISTINCT unnest(string_split(text,' ')) AS word FROM documents)
        |), pairs AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS word,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents
        |), per_doc AS (
        |  SELECT p.doc_id, count(*) AS n_tok, sum(v.tid * p.pos) AS checksum
        |  FROM pairs p JOIN vocab v ON v.word = p.word
        |  GROUP BY p.doc_id
        |)
        |SELECT CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(n_tok) AS BIGINT) AS tokens,
        |       CAST(sum(checksum) AS BIGINT) AS checksum_sum
        |FROM per_doc""".stripMargin,

    "q_sql_view" ->
      """WITH per_doc AS (
        |  SELECT source, len(string_split(text,' ')) AS n_tok FROM documents
        |)
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(n_tok) AS BIGINT) AS tokens,
        |       CAST(min(n_tok) AS BIGINT) AS min_tok,
        |       CAST(max(n_tok) AS BIGINT) AS max_tok
        |FROM per_doc
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // BMP layout recomputed from first principles: 24-bit rows pad to 4
    // bytes, so body = ((w*3+3)//4*4)*h — the oracle checks the ENGINE's
    // header parse against the format spec, not against itself
    "q_media_probe" ->
      """WITH dims AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
        |         n_chars % 32 + 4 AS w,
        |         n_chars % 24 + 4 AS h
        |  FROM documents
        |), sized AS (
        |  SELECT doc_id, w, h, ((w * 3 + 3) // 4 * 4) * h AS body
        |  FROM dims
        |)
        |SELECT doc_id,
        |       CAST(w AS BIGINT) AS width,
        |       CAST(h AS BIGINT) AS height,
        |       CAST(body AS BIGINT) AS body_bytes,
        |       CAST(ceil((body // 64) / 2.0) AS BIGINT) AS frames_kept
        |FROM sized
        |ORDER BY length(doc_id), doc_id""".stripMargin)
}
