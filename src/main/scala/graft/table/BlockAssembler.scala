package graft.table

import scala.collection.mutable.ArrayBuffer

import graft.codec.{IntBlocks, StrBlocks}

/** One input row of the block-assembly stage (post-shuffle, sorted by
  * (block_id, k, doc_id) within the partition). `tokens` is the row's
  * token array PRE-PACKED with the FOR codec on the map side: tokens
  * dominate the one data shuffle, and at typical token widths (≈5 bits on
  * this corpus) packing cuts the shuffled bytes ~5× vs 4 B/int UnsafeRow
  * arrays — on a real cluster that shuffle crosses the network, so this is
  * the difference between moving ~100 TB and ~20 TB.
  */
final case class BlockInput(
    block_id: Int,
    k: Long,
    doc_id: String,
    tokens: Array[Byte],
    n_tok: Int,
    source: String)

/** One encoded block = one output row = one manifest entry's data.
  * `row_xor`/`row_sum` are the xor and the wrapping (mod 2^64) sum over the
  * block's rows of the FULL-row value hash (bit-for-bit Spark's
  * `xxhash64(doc_id, n_tok, source, tokens)`, see
  * [[BlockAssembler.rowHash]]): resume confirmation compares the INPUT's
  * row-xor AND row-sum against the manifest's stored values — a metadata
  * aggregate — instead of decoding the whole table. The sum makes the
  * check multiplicity-sensitive (an even number of identical row changes
  * cancels in the xor but not in the sum — ADVICE r2).
  * `src_list` is the block's sorted distinct source values (null when more
  * than [[BlockAssembler.SrcListCap]] — such blocks are never pruned), the
  * zone map behind `decodeWhere`.
  */
final case class BlockRow(
    block_id: Int,
    ver: Int,
    row_count: Long,
    token_count: Long,
    doc_id_min: String,
    doc_id_max: String,
    tok_min: Int,
    tok_max: Int,
    plain_bytes: Long,
    row_xor: Long,
    row_sum: Long,
    src_list: Seq[String],
    pl_doc_id: Array[Byte],
    pl_tokens: Array[Byte],
    pl_n_tok: Array[Byte],
    pl_source: Array[Byte])

/** Streaming per-partition block assembly: rows arrive sorted by
  * (block_id, k, doc_id), so each block is a run of consecutive rows.
  * Exactly one block's columns are materialized at a time — memory is
  * O(targetRowsPerBlock), independent of partition size, which is what
  * lets the same code encode 10^12 rows without spill pathology.
  */
object BlockAssembler {

  /** Distinct-source cap for the per-block `src_list` zone map: sources are
    * low-cardinality by design (corpus provenance labels), so 64 covers any
    * real block; a pathological block above it stores null and simply stays
    * non-prunable.
    */
  val SrcListCap = 64

  /** Bit-exact JVM twin of the Catalyst expression
    * `xxhash64(doc_id, n_tok, source, tokens)` over (string, int, string,
    * array<int>): seed 42, then per child `hash = XXH64(child, hash)`,
    * arrays hashed element-wise. The equality with the SQL form is
    * property-tested (TableSpec); resume safety depends on it.
    */
  def rowHash(docId: String, nTok: Int, source: String, tokens: Array[Int]): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    var h = 42L
    h = XXH64.hashUTF8String(UTF8String.fromString(docId), h)
    h = XXH64.hashInt(nTok, h)
    h = XXH64.hashUTF8String(UTF8String.fromString(source), h)
    var i = 0
    while (i < tokens.length) { h = XXH64.hashInt(tokens(i), h); i += 1 }
    h
  }

  def assemble(
      it: Iterator[BlockInput],
      ver: Int,
      allowDict: Boolean,
      allowFsst: Boolean): Iterator[BlockRow] = new Iterator[BlockRow] {

    private val in: scala.collection.BufferedIterator[BlockInput] = it.buffered

    override def hasNext: Boolean = in.hasNext

    override def next(): BlockRow = {
      val blockId = in.head.block_id
      val docIds = new ArrayBuffer[String]
      val sources = new ArrayBuffer[String]
      val nToks = new ArrayBuffer[Int]
      var flat = new Array[Int](1 << 16)
      var flatLen = 0
      var plainBytes = 0L
      var rowXor = 0L
      var rowSum = 0L // wrapping mod-2^64 multiset hash
      var tokMin = Int.MaxValue
      var tokMax = Int.MinValue
      val srcSet = new java.util.TreeSet[String]()

      while (in.hasNext && in.head.block_id == blockId) {
        val r = in.next()
        docIds += r.doc_id
        sources += r.source
        nToks += r.n_tok
        val rowTokens = IntBlocks.decode(r.tokens) // FOR-packed on the map side
        require(flatLen.toLong + rowTokens.length <= Int.MaxValue,
          s"block $blockId exceeds 2^31 tokens — lower targetRowsPerBlock")
        if (flatLen + rowTokens.length > flat.length) {
          var cap = flat.length
          while (cap < flatLen + rowTokens.length) cap <<= 1
          flat = java.util.Arrays.copyOf(flat, cap)
        }
        System.arraycopy(rowTokens, 0, flat, flatLen, rowTokens.length)
        flatLen += rowTokens.length
        var ti = 0
        while (ti < rowTokens.length) {
          val t = rowTokens(ti)
          if (t < tokMin) tokMin = t
          if (t > tokMax) tokMax = t
          ti += 1
        }
        plainBytes += r.doc_id.length + r.source.length + 4L + 4L * r.n_tok
        val h = rowHash(r.doc_id, r.n_tok, r.source, rowTokens)
        rowXor ^= h
        rowSum += h
        if (srcSet.size <= SrcListCap) srcSet.add(r.source)
      }

      val tokens = java.util.Arrays.copyOf(flat, flatLen)
      BlockRow(
        block_id = blockId,
        ver = ver,
        row_count = docIds.length.toLong,
        token_count = flatLen.toLong,
        doc_id_min = docIds.head,
        doc_id_max = docIds.last,
        tok_min = if (flatLen == 0) 0 else tokMin,
        tok_max = if (flatLen == 0) 0 else tokMax,
        plain_bytes = plainBytes,
        row_xor = rowXor,
        row_sum = rowSum,
        src_list =
          if (srcSet.size > SrcListCap) null
          else srcSet.toArray(new Array[String](srcSet.size)).toIndexedSeq,
        pl_doc_id = StrBlocks.encodeAuto(docIds.toArray),
        pl_tokens = IntBlocks.encodeAutoChoice(tokens, allowDict, allowFsst)._1,
        pl_n_tok = IntBlocks.encodeAuto(nToks.toArray),
        pl_source = StrBlocks.encodeAuto(sources.toArray))
    }
  }
}
