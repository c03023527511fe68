package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization (PQ) kernels for compressed ANN at scale
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — the standard 100 TB vector-search scale
  * path: an encoded corpus stores `m` small codes per vector instead
  * of `dim` doubles, a 64× memory/scan compression at m=8, dim=64).
  *
  * Both kernels take the codebook as a PLAN LITERAL (like
  * [[NearestCentroid]]), so encode and scoring are NARROW maps — zero
  * shuffles, zero joins over the corpus. Codebook entries are
  * full-dim vectors (training rows); subspace `j` of `m` uses the
  * slice `[j·dsub, (j+1)·dsub)`. All folds run in a fixed sequential
  * order (subspace ascending, dimension ascending), so every emitted
  * double is reproducible bit-for-bit by any engine with the same
  * fold — the property the DuckDB oracle relies on.
  */
object PqExpressions // scaladoc anchor

/** `array<int>` of `m` PQ codes: per subspace, the argmin-sqdist
  * codebook entry (ties → lowest code id).
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Double]], m: Int)
    extends UnaryExpression with CodegenFallback {
  require(m > 0)
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val cb: Array[Array[Double]] = codebook.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val dsub = dim / m
    if (dsub == 0 || dsub * m != dim)
      throw new IllegalArgumentException(
        s"pq_encode: m=$m must divide the vector dim $dim (silent truncation " +
        "would drop trailing dimensions)")
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cen = cb(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val d = v.getDouble(off + i) - cen(off + i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric distance computation (ADC): approximate squared L2
  * distance between an exact query vector (left) and a PQ-coded
  * corpus vector (right, `array<int>` codes) —
  * Σ_j sqdist(q_slice_j, codebook(code_j)_slice_j), j ascending.
  */
case class PqAdcScore(left: Expression, right: Expression,
                      codebook: Seq[Seq[Double]], m: Int)
    extends BinaryExpression with CodegenFallback {
  require(m > 0)
  override def prettyName: String = "pq_adc_score"
  override def dataType: DataType = DoubleType

  @transient private lazy val cb: Array[Array[Double]] = codebook.map(_.toArray).toArray

  override def nullSafeEval(q0: Any, codes0: Any): Any = {
    val q = q0.asInstanceOf[ArrayData]
    val codes = codes0.asInstanceOf[ArrayData]
    val dim = q.numElements()
    val dsub = dim / m
    if (dsub == 0 || dsub * m != dim)
      throw new IllegalArgumentException(
        s"pq_adc_score: m=$m must divide the query dim $dim")
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc_score: codes has ${codes.numElements()} elements, expected m=$m " +
        "(codes must come from pq_encode with the SAME m)")
    var total = 0.0
    var j = 0
    while (j < m) {
      val code = codes.getInt(j)
      if (code < 0 || code >= cb.length)
        throw new IllegalArgumentException(
          s"pq_adc_score: code $code outside the ${cb.length}-entry codebook " +
          "(codes must come from pq_encode with the SAME codebook)")
      val cen = cb(code)
      val off = j * dsub
      var acc = 0.0
      var i = 0
      while (i < dsub) {
        val d = q.getDouble(off + i) - cen(off + i)
        acc += d * d
        i += 1
      }
      total += acc
      j += 1
    }
    total
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
