package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Runtime registration of graft's SQL functions on a live session —
  * the `createOrReplaceTempFunction` counterpart of
  * [[GraftExtensions]] (which hooks session construction via
  * `spark.sql.extensions`).
  */
object GraftFunctions {

  private[plans] def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** Constant `array<array<double>>` argument (centroid matrix /
    * PQ codebook), folded once at resolution into the plan.
    */
  private[plans] def matrixArg(e: Expression, fname: String): Seq[Seq[Double]] = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def bad(what: String) = throw new IllegalArgumentException(
      s"$fname expects a non-null constant array<array<double>>; $what")
    e match {
      case c if c.foldable => c.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) =>
          val v = c.eval()
          if (v == null) bad("got NULL")
          v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toObjectArray(ArrayType(DoubleType))
            .map { row =>
              if (row == null) bad("got a NULL row")
              row.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray().toSeq
            }.toSeq
        case t => bad(s"got type ${t.simpleString} (write double literals, e.g. 1.0d)")
      }
      case other => bad(s"got non-constant $other")
    }
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      (args: Seq[Expression]) => DotProduct(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine",
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_sqnorm",
      (args: Seq[Expression]) => SquaredNorm(args(0)), "built-in")
    reg.createOrReplaceTempFunction("vec_sqdist",
      (args: Seq[Expression]) => SquaredDistance(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      (args: Seq[Expression]) => WordShinglesExpr(args(0), intArg(args(1), "n")), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      (args: Seq[Expression]) => MinHashSignatureExpr(args(0),
        graft.operators.Dedup.defaultCoeffs(intArg(args(1), "k")), 2147483647L), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      (args: Seq[Expression]) => SimHash64Expr(args(0)), "built-in")
    reg.createOrReplaceTempFunction("capped_counter",
      (args: Seq[Expression]) =>
        CappedCounter(args(0), intArg(args(1), "cap")).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("nearest_centroid",
      // args(0) = vector, args(1) = constant array<array<double>> of
      // centroids (any foldable expression — `array(array(...))`
      // literals included); folded once at resolution into the plan.
      (args: Seq[Expression]) =>
        NearestCentroid(args(0), matrixArg(args(1), "nearest_centroid")), "built-in")
    reg.createOrReplaceTempFunction("simhash_portable",
      (args: Seq[Expression]) => SimHash64Expr(args(0), 60, portableMd5 = true), "built-in")
    reg.createOrReplaceTempFunction("pq_encode",
      // (vector, constant codebook of full-dim rows, m subspaces)
      (args: Seq[Expression]) =>
        PqEncode(args(0), matrixArg(args(1), "pq_encode"), intArg(args(2), "m")), "built-in")
    reg.createOrReplaceTempFunction("pq_adc_score",
      // (query vector, codes array<int>, constant codebook, m)
      (args: Seq[Expression]) =>
        PqAdcScore(args(0), args(1), matrixArg(args(2), "pq_adc_score"),
          intArg(args(3), "m")), "built-in")
  }
}
