package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension injection point: registers every graft_* function at
  * session build time, so a cluster deployment enables the engine with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no driver-side
  * register() call required (the standard extension pattern, cf.
  * SNIPPETS.md:37-61).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(
      "graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("graft_encode", "graft_encode(arr[, codec]) - encode array<int> to a codec payload") {
      case Seq(arr) => expr.GraftEncode(arr)
      case Seq(arr, codec) =>
        val name = codec.eval(null) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"codec name must be a string literal, got $other")
        }
        expr.GraftEncode(arr, Some(name))
      case _ => throw new IllegalArgumentException("graft_encode(arr[, codec])")
    }
    inject("graft_encode_str", "graft_encode_str(arr) - encode array<string>")(
      exprs => expr.GraftEncodeStr(exprs.head))
    inject("graft_decode", "graft_decode(bin) - decode to array<int>")(
      exprs => expr.GraftDecode(exprs.head))
    inject("graft_decode_str", "graft_decode_str(bin) - decode to array<string>")(
      exprs => expr.GraftDecodeStr(exprs.head))
    inject("graft_reslice", "graft_reslice(flat, lens) - rebuild per-row arrays")(
      exprs => expr.GraftReslice(exprs(0), exprs(1)))
    inject("graft_codec", "graft_codec(bin) - codec family name")(
      exprs => expr.GraftCodecName(exprs.head))
    inject("graft_dict_hash", "graft_dict_hash(bin) - sha256 of the dict section")(
      exprs => expr.GraftDictHash(exprs.head))
    inject("graft_simhash", "graft_simhash(arr) - 64-bit simhash")(
      exprs => expr.SimHash64(exprs.head))
    inject("graft_cosine", "graft_cosine(a, b) - cosine similarity")(
      exprs => expr.CosineSim(exprs(0), exprs(1)))
    inject("graft_minhash", "graft_minhash(arr, n) - minhash signature") { exprs =>
      val n = exprs(1).eval(null) match {
        case i: Int => i
        case other => throw new IllegalArgumentException(
          s"graft_minhash(arr, n): n must be an int literal, got $other")
      }
      expr.MinHashSig(exprs.head, n)
    }
    def intLit(e: Expression, fn: String): Int = e.eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$fn: expected an int literal, got $other")
    }
    inject("graft_hyperplane_sig",
      "graft_hyperplane_sig(vec, planes) - angular-LSH sign signature")(
      exprs => expr.HyperplaneSig(exprs.head,
        intLit(exprs(1), "graft_hyperplane_sig")))
    inject("graft_hyperplane_bands",
      "graft_hyperplane_bands(vec, bands, rows) - banded angular-LSH keys")(
      exprs => expr.HyperplaneBands(exprs.head,
        intLit(exprs(1), "graft_hyperplane_bands"),
        intLit(exprs(2), "graft_hyperplane_bands")))
  }
}
