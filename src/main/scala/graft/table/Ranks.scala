package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed global rank without a single-partition window.
  *
  * `Window.orderBy(key)` with no partition spec moves ALL rows into one
  * task — the exact anti-pattern that capped round 1's bound planning (a
  * 10^12-row table samples ~10^8 rows; one task sorting 10^8 keys is the
  * first thing to fall over at scale). This helper produces the same
  * 1-based dense rank with a range shuffle instead:
  *
  *   1. `repartitionByRange(p, key)` + `sortWithinPartitions(key)` — a
  *      normal Tungsten sort, spill-safe, p-way parallel;
  *   2. one tiny job counts rows per output partition
  *      (`groupBy(spark_partition_id())` — p rows to the driver);
  *   3. rank = partition offset (a p-entry literal map) + local position
  *      (`monotonically_increasing_id()`'s low 33 bits, which ARE the
  *      row index within the partition).
  *
  * Determinism: range-partition split points come from sampling and vary
  * with input layout, but the multiset order of `key` does not — so the
  * mapping rank → key value is a pure function of the data. When keys are
  * distinct the full (key, rank) assignment is layout-independent; with
  * duplicate keys only the key-at-rank (what bound planning consumes) is.
  */
object Ranks {

  /** Returns (ranked df with `rankCol` = 1-based rank by `key` ascending,
    * total row count, release thunk). The ranked frame reads a persisted
    * sorted intermediate — call `release()` once the downstream job(s) ran.
    */
  def withRank(
      df: DataFrame,
      key: Column,
      rankCol: String,
      partitions: Int): (DataFrame, Long, () => Unit) = {
    val p = math.max(1, partitions)
    val sorted = df
      .repartitionByRange(p, key.asc)
      .sortWithinPartitions(key.asc)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts: Map[Int, Long] = sorted
      .groupBy(spark_partition_id().as("_pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.valuesIterator.sum
    // prefix-sum offsets over pid order (empty partitions count 0)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until p).map { pid =>
        val o = pid -> acc
        acc += counts.getOrElse(pid, 0L)
        o
      }.toMap
    }
    val mid = monotonically_increasing_id()
    val ranked = sorted.withColumn(
      rankCol,
      element_at(typedLit(offsets), shiftright(mid, 33).cast("int")) +
        mid.bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
    (ranked, total, () => { sorted.unpersist(false); () })
  }
}
