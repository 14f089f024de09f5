package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Training-pipeline operator tests: dedup (exact / MinHash-LSH / SimHash /
  * brute Jaccard / embedding), similarity search, text analysis — against
  * the real sf0.001 testdata plus crafted duplicates where the corpus lacks
  * them.
  */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.001"
  private lazy val docs =
    spark.read.parquet(s"$SfDir/documents.parquet").cache()
  private lazy val emb =
    spark.read.parquet(s"$SfDir/embeddings.parquet").cache()

  test("exact dedup: planted duplicates are flagged, originals kept") {
    val planted = docs.select(col("doc_id").cast("string"), col("text"))
      .unionAll(docs.where(col("doc_id") < 5)
        .select(concat(lit("9000"), col("doc_id")).as("doc_id"), col("text")))
    val out = Dedup.exact(planted)
    assert(out.where(col("is_dup")).count() == 5)
    // the kept row of each dup group is the shortest/smallest doc_id
    val kept = out.where(!col("is_dup") && col("group_size") > 1)
      .select("doc_id").as[String].collect().toSet
    assert(kept == Set("0", "1", "2", "3", "4"))
    // without planting, the corpus has no exact dups
    assert(Dedup.exact(docs).where(col("is_dup")).count() == 0)
  }

  test("minhash-LSH finds exactly the brute-force near-dup pairs (sf0.001)") {
    val lsh = Dedup.minHashLsh(docs, threshold = 0.9)
      .select("doc_a", "doc_b").as[(String, String)].collect().toSet
    val brute = Dedup.ngramJaccardBrute(docs, threshold = 0.9)
      .select("doc_a", "doc_b").as[(String, String)].collect().toSet
    assert(brute.nonEmpty, "corpus should contain planted near-duplicates")
    assert(lsh == brute)
  }

  test("minhash-LSH bucket cap bounds degenerate buckets, small buckets unaffected") {
    // 1000 identical docs (the adversarial case: same signature → same
    // bucket in EVERY band → a quadratic 16×C(1000,2) candidate join
    // without the cap) + one genuine near-dup pair from the real corpus
    val nearDup = docs.orderBy("doc_id").limit(1)
      .select(col("text")).as[String].head()
    val words = nearDup.split(" ")
    val tweaked = (words.take(words.length - 1) :+ "zzz").mkString(" ")
    val degenerate = (0 until 1000).map(i => (s"dg$i", nearDup + " " + nearDup))
    val planted = (degenerate ++ Seq(("1", nearDup), ("2", tweaked)))
      .toDF("doc_id", "text")
    val out = Dedup.minHashLsh(planted, threshold = 0.5, maxBucket = 50)
      .select("doc_a", "doc_b").as[(String, String)].collect().toSet
    // the 1000-doc cluster's buckets exceed the cap in every band → skipped
    assert(!out.exists { case (a, b) => a.startsWith("dg") || b.startsWith("dg") })
    // the small-bucket near-dup pair is still found
    assert(out.contains(("1", "2")), s"planted pair missing from $out")
  }

  test("jaccardPairs equals brute force; ordered frame persists; cap bounds floods") {
    val exactQ = Dedup.jaccardPairs(docs, threshold = 0.9)
    val exact = exactQ
      .select("doc_a", "doc_b").as[(String, String)].collect().toSet
    val brute = Dedup.ngramJaccardBrute(docs, threshold = 0.9)
      .select("doc_a", "doc_b").as[(String, String)].collect().toSet
    assert(brute.nonEmpty && exact == brute)
    // the rarest-first `ordered` frame must come from the cache in all
    // three consumers, not recompute its posts⋈freq+collect_list subtree
    // per consumer (the round-2 minHashLsh lineage mistake)
    val plan = exactQ.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan.take(2000))

    // prefix-posting-list cap: a flood of identical docs puts every
    // prefix shingle in a posting list of flood size — above a tiny cap
    // the flood's pairs are skipped; at the default cap the full
    // quadratic pair set is still exact
    val flood = (0 until 20).map(i => (s"f$i",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z")).toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(flood, 0.9, maxPrefixBucket = 3).count() == 0L)
    assert(Dedup.jaccardPairs(flood, 0.9).count() == 190L) // C(20,2)
  }

  test("clusters: transitive closure over pairs, canonical = smallest id") {
    // chain 1: 2-3-10 (transitively connected even though 2!~10);
    // chain 2: 7-8; 5 and 9 are singletons. Ids chosen so (length, lex)
    // order != plain lex order ("10" < "2" lexicographically but 2 is
    // smaller by (length, lex)).
    val pairs = Seq(("2", "3"), ("3", "10"), ("7", "8"))
      .toDF("doc_a", "doc_b")
    val ds = Seq("2", "3", "10", "7", "8", "5", "9").toDF("doc_id")
    val out = Dedup.clusters(pairs, ds).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    Dedup.releaseCaches(blocking = true)
    assert(out("2") == (("2", 3L, true)))
    assert(out("3") == (("2", 3L, false)))
    assert(out("10") == (("2", 3L, false)))
    assert(out("7") == (("7", 2L, true)))
    assert(out("8") == (("7", 2L, false)))
    assert(out("5") == (("5", 1L, true)))
    assert(out("9") == (("9", 1L, true)))
    // a long chain converges through pointer jumping (diameter 40 needs
    // ~log2(40) rounds, well under the default cap)
    val chain = (0 until 40).map(i => (s"c%03d".format(i), s"c%03d".format(i + 1)))
      .toDF("doc_a", "doc_b")
    val chainDocs = (0 to 40).map(i => s"c%03d".format(i)).toDF("doc_id")
    val labels = Dedup.clusters(chain, chainDocs).collect()
    Dedup.releaseCaches(blocking = true)
    assert(labels.length == 41)
    assert(labels.forall(_.getString(1) == "c000"))
    assert(labels.count(_.getBoolean(3)) == 1)
  }

  test("clusters: pair endpoints absent from docs neither leak nor win labels") {
    // "1" pairs with ghost "0" (not in docs): the ghost must not appear in
    // the output, and must not win the min-label (which would mark the
    // whole real cluster non-canonical — ADVICE r5)
    val pairs = Seq(("0", "1"), ("1", "2")).toDF("doc_a", "doc_b")
    val ds = Seq("1", "2", "3").toDF("doc_id")
    val out = Dedup.clusters(pairs, ds).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    Dedup.releaseCaches(blocking = true)
    assert(out.keySet == Set("1", "2", "3"), out.toString) // one row per INPUT doc
    assert(out("1") == (("1", 2L, true)))  // ghost "0" did not win the label
    assert(out("2") == (("1", 2L, false)))
    assert(out("3") == (("3", 1L, true))) // singleton via the anti-join path
  }

  test("clusters: one action per propagation round (convergence is observed in-pass)") {
    // action accounting: convergence must be read from the generation's
    // own observe() metric, not from a second per-round action (the old
    // compare-join isEmpty) — iterative rounds are the one place
    // per-round latency multiplies. Count query-execution actions by name.
    val byName = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val lsn = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        byName.merge(funcName, 1, (a, b) => a + b)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    val path = Seq(("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("p4", "p5"))
      .toDF("doc_a", "doc_b")
    val pdocs = Seq("p1", "p2", "p3", "p4", "p5").toDF("doc_id")
    // force the ITERATIVE path (a 4-edge graph would otherwise take the
    // driver union-find fast path, which has no rounds to account)
    System.setProperty("graft.clusters.driverEdgeMax", "0")
    spark.listenerManager.register(lsn)
    try {
      val out = Dedup.clusters(path, pdocs).collect()
      assert(out.length == 5 && out.forall(_.getString(1) == "p1"))
      // listener delivery is async — poll until counts stabilize
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1
      var cur = byName.values().stream().mapToInt(_.intValue).sum()
      while (cur != last && System.nanoTime() < deadline) {
        last = cur; Thread.sleep(200)
        cur = byName.values().stream().mapToInt(_.intValue).sum()
      }
      val checkpoints = byName.getOrDefault("localCheckpoint", 0) +
        byName.getOrDefault("checkpoint", 0)
      val empties = byName.getOrDefault("isEmpty", 0)
      val counts = byName.getOrDefault("count", 0)
      // diameter 4 ⇒ ≥2 propagation rounds + 1 confirming round, each ONE
      // checkpoint action (round 1 builds straight off the edges — no
      // seed checkpoint). The only isEmpty is the up-front no-edges
      // guard; no per-round count() fallback fired.
      assert(checkpoints >= 3, byName.toString)
      assert(empties <= 1, byName.toString)
      assert(counts == 0, byName.toString)
    } finally {
      System.clearProperty("graft.clusters.driverEdgeMax")
      spark.listenerManager.unregister(lsn)
      Dedup.releaseCaches(blocking = true)
    }
  }

  test("clusters: driver union-find path equals the distributed propagation path") {
    // randomized graph with ids whose (length, lex) order differs from
    // plain lex ("10" vs "2") AND whose UTF-8 byte order differs from
    // UTF-16 order (U+10000 '𐀀' sorts after U+FFFD in UTF-8
    // but before it in UTF-16) — the driver path must replicate Spark's
    // min(struct(length(id), id)) exactly. Includes duplicate pairs,
    // self-pairs, ghost endpoints, and singleton docs.
    val supp = new String(Character.toChars(0x10000))
    val rng = new scala.util.Random(42)
    val vs = (0 until 120).map(_.toString) ++ Seq(supp, "�", "a", "aa")
    val edges = (0 until 180).map { _ =>
      (vs(rng.nextInt(vs.length)), vs(rng.nextInt(vs.length)))
    } ++ Seq(("7", "7"), ("3", "11"), ("3", "11"), ("ghost", "5"),
      (supp, "�"))
    val pairs = edges.toDF("doc_a", "doc_b")
    val ds = (vs ++ Seq("lonely", "solo")).toDF("doc_id")
    def run(): Map[String, (String, Long, Boolean)] = {
      val m = Dedup.clusters(pairs, ds).collect()
        .map(r => r.getString(0) ->
          ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
      Dedup.releaseCaches(blocking = true)
      m
    }
    val driver = run() // default gate: 4-figure edge list takes the driver path
    System.setProperty("graft.clusters.driverEdgeMax", "0")
    val distributed = try run()
    finally System.clearProperty("graft.clusters.driverEdgeMax")
    assert(driver.size == ds.count())
    assert(driver == distributed)
  }

  test("cap skips are logged + recorded; releaseCaches clears shingle caches") {
    Dedup.capSkips.clear()
    Dedup.releaseCaches(blocking = true) // drain frames earlier tests left
    val before = spark.sparkContext.getPersistentRDDs.size
    // a flood PLUS survivors: with an all-capped (empty) result AQE's
    // empty-relation propagation can prune the metrics node (documented
    // in Dedup) — the observable-warning contract is for partial floods
    val flood = ((0 until 20).map(i => (s"f$i",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z")) ++ Seq(
      ("x1", "p q r s t u v w a b c d e f g h zz yy xx ww vv uu tt ss rr qq"),
      ("x2", "p q r s t u v w a b c d e f g h zz yy xx ww vv uu tt ss rr qk")))
      .toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(flood, 0.5, maxPrefixBucket = 3).count() == 1L)
    assert(Dedup.minHashLsh(flood, threshold = 0.5, maxBucket = 3).count() == 1L)
    // a capped skip is never silent: the observed metric reaches the
    // listener (async — poll bounded) and records per-operator counts
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while ((!Dedup.capSkips.containsKey("jaccard") ||
      !Dedup.capSkips.containsKey("minhash")) && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(Dedup.capSkips.getOrDefault("jaccard", 0L) > 0, Dedup.capSkips.toString)
    assert(Dedup.capSkips.getOrDefault("minhash", 0L) > 0, Dedup.capSkips.toString)
    // both operators persisted a shingle frame; release reclaims them and
    // leaves no lingering cached RDDs behind (the session-lifetime leak)
    assert(Dedup.releaseCaches(blocking = true) >= 2)
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }

  test("simhash: near-identical long docs land far closer than unrelated ones") {
    // SimHash needs enough terms for the per-bit counters to concentrate;
    // replicate each text 20× so a single-word change perturbs counters by
    // ±2 against a ~sqrt(1000) magnitude. A = base, B = one word changed,
    // C = a different document.
    val texts = docs.orderBy("doc_id").limit(2)
      .select("text").as[String].collect()
    val a = ((texts(0) + " ") * 20).trim
    val b = ("zzz" + a.dropWhile(_ != ' '))
    val c = ((texts(1) + " ") * 20).trim
    val df = Seq(("a", a), ("b", b), ("c", c)).toDF("id", "text")
      .select(col("id"), graft.functions.graft_simhash(split(col("text"), " ")).as("sk"))
    val sk = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sk("a"), sk("b")) <= 8, s"near-dup hamming ${ham(sk("a"), sk("b"))}")
    assert(ham(sk("a"), sk("b")) < ham(sk("a"), sk("c")),
      s"${ham(sk("a"), sk("b"))} !< ${ham(sk("a"), sk("c"))}")

    // and the pair pipeline surfaces an exact replica at hamming 0
    val planted = docs.select(col("doc_id").cast("string"), col("text"))
      .unionAll(docs.where(col("doc_id") === 7)
        .select(lit("90007").as("doc_id"), col("text")))
    val found = Dedup.simHash(planted, maxHamming = 0)
      .select("doc_a", "doc_b").as[(String, String)].collect().toSet
    assert(found.contains(("7", "90007")))
  }

  test("simhash bucket cap bounds identical-doc floods; normal pairs unaffected") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    // the planted pair must NOT share the flood's text: near-identical
    // docs land in the flood's (capped) buckets and would be skipped too
    val other = "one two three four five six seven eight nine ten " * 4
    val flood = (0 until 200).map(i => (s"dg$i", text))
    val planted = (flood ++ Seq(("1", other + " tail"), ("2", other + " tail2")))
      .toDF("doc_id", "text")
    val out = Dedup.simHash(planted, maxHamming = 8, maxBucket = 50)
      .select("doc_a", "doc_b").as[(String, String)].collect().toSet
    // the 200-doc flood exceeds the cap in every band → skipped entirely
    assert(!out.exists { case (a, b) => a.startsWith("dg") || b.startsWith("dg") })
    // the small-bucket near-identical pair is still found
    assert(out.contains(("1", "2")), out.toString)
    // at the default cap the flood's pairs ARE reported
    val full = Dedup.simHash(planted, maxHamming = 8)
      .select("doc_a", "doc_b").as[(String, String)].collect()
    assert(full.count { case (a, b) => a.startsWith("dg") && b.startsWith("dg") } ==
      200 * 199 / 2)
  }

  test("embedding near-dup: planted twin vectors are found via LSH buckets") {
    val planted = emb.select(col("vec_id"), col("embedding"))
      .unionAll(emb.where(col("vec_id") < 3)
        .select((col("vec_id") + 9000).as("vec_id"), col("embedding")))
    val pairs = Dedup.embeddingNearDup(planted, threshold = 0.999)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    (0 until 3).foreach { i =>
      assert(pairs.contains((i.toLong, 9000L + i)), s"missing twin $i")
    }
  }

  test("brute-force cosine top-k is sane and self-consistent") {
    val queries = emb.where(col("vec_id") < 3)
    val out = Similarity.bruteForceTopK(emb, queries, k = 5)
    assert(out.count() == 15)
    // ranks are 1..5 per query, descending cosine
    val byQ = out.orderBy("query_id", "rank")
      .select("query_id", "rank", "cosine").collect()
      .groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val sims = rows.map(_.getDouble(2)).toSeq
      assert(sims == sims.sorted.reverse)
    }
    // self is excluded
    assert(out.where(col("query_id") === col("vec_id")).count() == 0)
  }

  test("LSH top-k returns a subset ranking consistent with brute force") {
    val queries = emb.where(col("vec_id") < 5)
    val lsh = Similarity.lshTopK(emb, queries, k = 3, bands = 2, rowsPerBand = 2)
    // every LSH hit appears in the brute-force full ranking of that query
    val brute = Similarity.bruteForceTopK(emb, queries, k = 500)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val hits = lsh.select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(hits.nonEmpty)
    hits.foreach(h => assert(brute.contains(h)))
  }

  test("banded LSH top-k at default width EQUALS brute-force top-k (sf0.001)") {
    // the scale path must not lose neighbours on this corpus even at weak
    // cosine (~0.27-0.39 top-5s): 24 bands × 2 bits gives per-neighbour
    // recall ≥ 0.997 at cos 0.25 — verified exactly here and by the
    // q_ann_lsh oracle at sf0.01
    val queries = emb.where(col("vec_id") < 10)
    val lsh = Similarity.lshTopK(emb, queries, k = 5)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
    assert(lsh == brute,
      s"missing=${(brute -- lsh).toSeq.sorted} extra=${(lsh -- brute).toSeq.sorted}")
  }

  test("banded embedding near-dup EQUALS brute-force pairs at 0.46 (sf0.001)") {
    val lsh = Dedup.embeddingNearDup(emb, threshold = 0.46, bands = 16, rowsPerBand = 2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val a = emb.alias("a"); val b = emb.alias("b")
    val brute = a.crossJoin(b)
      .where(col("a.vec_id") < col("b.vec_id"))
      .where(Similarity.cosine(col("a.embedding"), col("b.embedding")) >= 0.46)
      .select(col("a.vec_id").cast("long"), col("b.vec_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "corpus should contain pairs at 0.46")
    assert(lsh == brute,
      s"missing=${(brute -- lsh).toSeq.sorted} extra=${(lsh -- brute).toSeq.sorted}")
  }

  test("IVF: exact at nprobe=k, twins at nprobe=1, recall monotone in nprobe") {
    val queries = emb.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
    val idx = Ivf.build(emb, numCentroids = 22)
    // probing every list degenerates to exact search — plumbing is lossless
    val all = Ivf.topK(idx, queries, 5, nprobe = 22)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
    assert(all == brute)
    // recall rises with nprobe (this corpus is near-isotropic noise, so
    // absolute recall at low nprobe is weak by construction — what must
    // hold is monotonicity and the near-dup case below)
    def recall(np: Int): Double = {
      val got = Ivf.topK(idx, queries, 5, np)
        .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
      (brute & got).size.toDouble / brute.size
    }
    assert(recall(12) >= recall(4))
    // a planted twin lands in ITS original's list: found at nprobe=1 —
    // the near-dup regime IVF actually serves at scale
    val planted = emb.select(col("vec_id"), col("embedding"))
      .unionAll(emb.where(col("vec_id") < 3)
        .select((col("vec_id") + 9000).as("vec_id"), col("embedding")))
    val idx2 = Ivf.build(planted, numCentroids = 22)
    val twinQ = planted.where(col("vec_id") >= 9000)
    val hits = Ivf.topK(idx2, twinQ, k = 1, nprobe = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    (0 until 3).foreach { i =>
      assert(hits.get(9000L + i).contains(i.toLong), s"twin $i not in its own list")
    }
  }

  test("IVF Lloyd refinement: deterministic centroids, exactness preserved") {
    val queries = emb.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
    // two independent trainings produce IDENTICAL centroids (integer-
    // scaled Lloyd sums: partition add-order cannot perturb them)
    val c1 = Ivf.trainCentroids(emb, 22, lloydIters = 2).value
    val c2 = Ivf.trainCentroids(emb.repartition(7), 22, lloydIters = 2).value
    assert(c1.length == 22 && c2.length == 22)
    (0 until 22).foreach(i => assert(c1(i).sameElements(c2(i)), s"centroid $i differs"))
    // refined index still exhaustive-exact at nprobe=k
    val idx = Ivf.build(emb, numCentroids = 22, lloydIters = 2)
    val all = Ivf.topK(idx, queries, 5, nprobe = 22)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
    assert(all == brute)
  }

  test("quality signals + token counts are computed for every doc") {
    val q = TextAnalysis.quality(docs)
    assert(q.count() == 500)
    assert(q.where(col("n_stop") > col("n_words")).count() == 0)
    assert(q.where(col("distinct_ratio") > 1.0 || col("distinct_ratio") <= 0.0).count() == 0)
    assert(q.where(col("mean_word_len") <= 0.0).count() == 0)
    val t = TextAnalysis.tokenCounts(docs)
    // space-separated lowercase words: ws and bpe-ish counts agree here
    assert(t.where(col("ws_tokens") =!= col("bpe_tokens")).count() == 0)
  }

  test("langid pipeline predicts the majority structure deterministically") {
    val out = TextAnalysis.langId(docs).cache()
    assert(out.count() == 500) // one prediction per doc
    val out2 = TextAnalysis.langId(docs)
    // deterministic: same predictions on re-run
    assert(out.select("doc_id", "lang_pred").except(
      out2.select("doc_id", "lang_pred")).count() == 0)
    // the integer scorer is biased to the largest lang slice; with a shared
    // vocab it must still produce a valid lang for every doc
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(out.select("lang_pred").as[String].collect().forall(langs.contains))
  }

  test("pipeline: quality → dedup → near-dup → tokenize → encode") {
    // plant one exact dup and keep the corpus's own near-dups
    val planted = docs.select(col("doc_id").cast("string"), col("text"),
      col("lang"), col("source"), col("n_chars"))
      .unionAll(docs.where(col("doc_id") === 7)
        .select(lit("97007").as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val rep = Pipeline.cleanAndEncode(planted, dir,
      opts = graft.table.GraftTable.Options(targetRowsPerBlock = 64))
    assert(rep.input == 501)
    assert(rep.afterQuality <= rep.input)
    assert(rep.afterExactDedup == rep.afterQuality - 1) // the planted dup
    assert(rep.afterNearDedup < rep.afterExactDedup) // corpus near-dups removed
    assert(rep.encode.complete)
    assert(rep.encode.rowCount == rep.afterNearDedup)
    // the committed table round-trips
    val dec = graft.table.GraftTable.decode(spark, dir)
    assert(dec.count() == rep.afterNearDedup)
  }

  test("pipeline transitive near-dup policy keeps ONE canonical per component") {
    // A and B are near-dups of C but not of each other (C bridges them):
    // pairwise policy keeps the component's sources; transitive keeps
    // exactly one doc per connected component.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val a = base + " one two three"
    val c = base + " one two four" // near-dup of both a and b
    val b = base + " one five four"
    val crafted = Seq(("1", a), ("2", c), ("3", b)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("srcX").as("source"), length(col("text")).cast("long").as("n_chars"))
    val dirP = java.nio.file.Files.createTempDirectory("graft-pipe-pair").toString
    val pairwise = Pipeline.cleanAndEncode(crafted, dirP, minWords = 5,
      nearDupThreshold = 0.7,
      opts = graft.table.GraftTable.Options(targetRowsPerBlock = 64))
    val dirT = java.nio.file.Files.createTempDirectory("graft-pipe-trans").toString
    val transitive = Pipeline.cleanAndEncode(crafted, dirT, minWords = 5,
      nearDupThreshold = 0.7, transitiveNearDup = true,
      opts = graft.table.GraftTable.Options(targetRowsPerBlock = 64))
    assert(transitive.afterNearDedup == 1,
      s"one canonical expected, got ${transitive.afterNearDedup}")
    assert(pairwise.afterNearDedup >= transitive.afterNearDedup)
    val kept = graft.table.GraftTable.decode(spark, dirT)
      .toDF().select("doc_id").collect().map(_.getString(0)).toSeq
    assert(kept == Seq("1"), s"canonical must be the smallest id, got $kept")
  }

  test("pipeline near-dup removal completes on a SHUFFLE anti join (no broadcast)") {
    // a 10^12-row corpus can have billions of near-dup ids: the kill list
    // must not carry a forced broadcast hint (VERDICT r2). Disabling
    // auto-broadcast forces the planner onto the shuffle path — the
    // pipeline must still complete with identical results.
    val planted = docs.select(col("doc_id").cast("string"), col("text"),
      col("lang"), col("source"), col("n_chars"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-pipe-shuffle").toString
      val rep = Pipeline.cleanAndEncode(planted, dir,
        opts = graft.table.GraftTable.Options(targetRowsPerBlock = 64))
      assert(rep.encode.complete)
      assert(rep.afterNearDedup < rep.afterExactDedup)
      assert(graft.table.GraftTable.decode(spark, dir).count() == rep.afterNearDedup)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("fingerprint is order-sensitive and stable") {
    val fp = TextAnalysis.fingerprint(docs)
    assert(fp.select(countDistinct("fingerprint")).as[Long].head() > 490)
    val swapped = docs.withColumn("text",
      concat_ws(" ", reverse(split(col("text"), " "))))
    val fp2 = TextAnalysis.fingerprint(swapped)
    val joined = fp.alias("a").join(fp2.alias("b"), "doc_id")
      .where(col("a.fingerprint") === col("b.fingerprint"))
    // reversing word order changes (almost) every fingerprint
    assert(joined.count() < 5)
  }
}
