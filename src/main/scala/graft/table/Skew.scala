package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for key-grouped aggregations (SURVEY.md E14).
  *
  * The north rule requires salting of skewed `source` values in addition to
  * AQE's runtime skew splitting: a single hot key hashes every one of its
  * rows to one reducer, so at 10^12 rows a 30%-hot source turns one task
  * into the job's critical path. Two-phase salted aggregation bounds any
  * key's per-task rows to 1/salts of its total, at the cost of a second
  * (tiny, keys×salts-row) exchange.
  *
  * The salt is `xxhash64(saltBy) % salts` — a pure function of the data, no
  * RNG — so repeated runs shuffle identically (snapshot determinism).
  */
object Skew {

  val DefaultSalts = 32

  /** Skewed iff any key holds more than `factor`× the mean per-key rows. */
  final case class Report(rows: Long, keys: Long, maxKeyRows: Long, hotKeys: Seq[String]) {
    def isSkewed: Boolean = hotKeys.nonEmpty
  }

  def detect(df: DataFrame, key: Column, factor: Double = 4.0): Report = {
    val counts = df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
      .agg(
        sum("cnt").as("rows"),
        count(lit(1)).as("keys"),
        max("cnt").as("mx"))
      .head()
    val rows = counts.getLong(0)
    val keys = counts.getLong(1)
    val mean = rows.toDouble / math.max(1L, keys)
    val hot = df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > lit(mean * factor))
      .select(col("k").cast("string"))
      .collect().map(_.getString(0)).toSeq.sorted
    Report(rows, keys, counts.getLong(2), hot)
  }

  /** Two-phase salted `groupBy(key).agg(sum-like partials)`: phase 1 groups
    * by (key, salt) so a hot key spreads over `salts` reducers; phase 2
    * merges the ≤ keys×salts partials. Only decomposable aggregates (sum,
    * count, min, max) are expressible this way — exactly what the stats and
    * metrics jobs need.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltBy: Column,
      salts: Int = DefaultSalts)(
      partials: Seq[(Column, String)], // (phase-1 agg over rows, result name)
      merge: String => Column // phase-2 agg over a phase-1 result column name
  ): DataFrame = {
    val salted = df.withColumn("_graft_salt", pmod(xxhash64(saltBy), lit(salts.toLong)))
    val p1 = salted.groupBy(key.as("_graft_key"), col("_graft_salt"))
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    p1.groupBy(col("_graft_key"))
      .agg(merge(partials.head._2).as(partials.head._2),
        partials.tail.map { case (_, n) => merge(n).as(n) }: _*)
      .withColumnRenamed("_graft_key", "key")
  }

  /** Salted per-key row counts (the common case). */
  def saltedKeyCounts(df: DataFrame, key: Column, saltBy: Column, salts: Int = DefaultSalts): DataFrame =
    saltedAgg(df, key, saltBy, salts)(
      Seq((count(lit(1)), "cnt")), n => sum(col(n)))
}
