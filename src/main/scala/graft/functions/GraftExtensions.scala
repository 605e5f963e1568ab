package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's native expressions as SQL functions, so the raw
  * SQL passthrough surface (reference H7) can use them too:
  *
  * {{{
  *   SELECT graft_dot(a.embedding, b.embedding) ...
  *   SELECT graft_simhash(transform(split(text,' '), t -> md5(t))) ...
  *   SELECT graft_minhashes(shingles, 12), graft_winnow_min(text, 5) ...
  * }}}
  *
  * Wire up either via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions=graft.functions.GraftExtensions` conf (the
  * standard mechanism for cluster-wide deploys).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, "", name, usage, "", "", "",
      "misc_funcs", "4.0.0", "", "scala_udf")

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(md5s) - 32-bit simhash of an array<string> of md5 hex"),
      (args: Seq[Expression]) => SimHashExpr(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_minhashes"),
      info("graft_minhashes", "graft_minhashes(shingles, k) - k md5 minhashes"),
      (args: Seq[Expression]) => MinHashesExpr(args(0), intArg(args(1), "k"))))
    ext.injectFunction((FunctionIdentifier("graft_winnow_min"),
      info("graft_winnow_min", "graft_winnow_min(text, k) - min md5 over all char k-grams"),
      (args: Seq[Expression]) => WinnowMinExpr(args(0), intArg(args(1), "k"))))
    ext.injectFunction((FunctionIdentifier("graft_hashed_shingles"),
      info("graft_hashed_shingles",
        "graft_hashed_shingles(text, n) - distinct xxhash64 word n-grams as array<bigint>"),
      (args: Seq[Expression]) => HashedShinglesExpr(args(0), intArg(args(1), "n"))))
  }
}
