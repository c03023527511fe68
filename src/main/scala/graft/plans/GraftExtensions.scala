package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for graft's native expressions, via the
  * standard `SparkSessionExtensions` hook:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)  // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * makes `vec_dot`, `vec_cosine`, `vec_sqnorm`, `vec_sqdist`,
  * `word_shingles`, `minhash_signature`, `simhash64`, and
  * `capped_counter` usable from plain SQL, planned and codegen'd like
  * built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential dot product of two array<double>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two array<double>"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_sqnorm"),
      info("vec_sqnorm", "vec_sqnorm(a) - sum of squares"),
      (args: Seq[Expression]) => SquaredNorm(args(0))))
    ext.injectFunction((FunctionIdentifier("vec_sqdist"),
      info("vec_sqdist", "vec_sqdist(a, b) - squared euclidean distance"),
      (args: Seq[Expression]) => SquaredDistance(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(tokens, n) - distinct word n-grams"),
      (args: Seq[Expression]) => WordShinglesExpr(args(0), intArg(args(1), "n"))))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingles, k) - MinHash signature array<bigint>"),
      (args: Seq[Expression]) => MinHashSignatureExpr(args(0),
        graft.operators.Dedup.defaultCoeffs(intArg(args(1), "k")), 2147483647L)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64Expr(args(0))))
    ext.injectFunction((FunctionIdentifier("capped_counter"),
      info("capped_counter", "capped_counter(key, cap) - memory-capped frequency map"),
      (args: Seq[Expression]) =>
        CappedCounter(args(0), intArg(args(1), "cap")).toAggregateExpression()))
  }
}
