package graft

import org.apache.spark.sql.{Column, GraftSql, SparkSession}

/** Public typed-Column API over the graft codec expressions — the
  * engine-user surface, mirroring `org.apache.spark.sql.functions`.
  */
object functions {

  /** Encode an `array<int>` column into a self-describing binary payload,
    * auto-selecting the smallest codec per row.
    */
  def graft_encode(c: Column): Column =
    GraftSql.column(expr.GraftEncode(GraftSql.expression(c)))

  /** Encode forcing a specific codec: plain, bitpack, for, delta_for, rle,
    * dict, fsst.
    */
  def graft_encode(c: Column, codec: String): Column =
    GraftSql.column(expr.GraftEncode(GraftSql.expression(c), Some(codec)))

  /** Decode a graft payload back to `array<int>` (bit-identical). */
  def graft_decode(c: Column): Column =
    GraftSql.column(expr.GraftDecode(GraftSql.expression(c)))

  /** Decode a graft string payload back to `array<string>`. */
  def graft_decode_str(c: Column): Column =
    GraftSql.column(expr.GraftDecodeStr(GraftSql.expression(c)))

  /** Rebuild per-row arrays from a flat decoded stream + per-row lengths. */
  def graft_reslice(flat: Column, lengths: Column): Column =
    GraftSql.column(expr.GraftReslice(GraftSql.expression(flat), GraftSql.expression(lengths)))

  /** Register the graft_* SQL functions on a session. */
  def register(spark: SparkSession): Unit = GraftSql.registerFunctions(spark)
}
