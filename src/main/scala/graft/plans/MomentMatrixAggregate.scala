package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact upper-triangle product-moment sums of an integer vector
  * column in ONE aggregation buffer — the covariance/PCA moment pass
  * without the per-row triangle explode.
  *
  * The composable formulation (`explode` of (d+1)(d+2)/2 product
  * structs per row, then a (i, j)-keyed decimal sum) is semantically
  * right but pays struct allocation + expression evaluation per
  * TRIANGLE CELL per row — 2 145 rows exploded per input row at
  * d = 64, which benchmarked ~55 s on 50k vectors. This aggregate
  * walks the same triangle in a tight primitive loop over ONE buffer
  * per partition (map-side combine), so the shuffle carries one
  * 128-bit integer per cell per partition and nothing is ever
  * exploded.
  *
  * Exactness: every cell accumulates the signed 128-bit sum of
  * `v_i · v_j` products (`Math.multiplyHigh` + carry-propagated
  * two's-complement adds). Integer sums are summation-order immune,
  * so results are bit-identical across partitionings and engines,
  * and 2^127 headroom means ~1.8×10^19 max-magnitude products fit a
  * cell — no practical corpus overflows it. Output is
  * `array<struct<i int, j int, s decimal(38,0)>>` for the upper
  * triangle (i ≤ j) in row-major order; a cell beyond decimal(38,0)
  * (≥ 10^38) throws rather than truncating.
  *
  * Input rows must all carry the same vector length; a null or
  * length-mismatched row throws (data bug, not a skippable value).
  */
case class MomentMatrix(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")

  private val nCells = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "moment_matrix"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("s", DecimalType(38, 0), nullable = false))),
    containsNull = false)

  /** buffer layout: [hi0, lo0, hi1, lo1, …] — one signed 128-bit
    * accumulator per triangle cell.
    */
  override def createAggregationBuffer(): Array[Long] = new Array[Long](nCells * 2)

  private def add128(buf: Array[Long], cell: Int, pHi: Long, pLo: Long): Unit = {
    val base = cell << 1
    val lo = buf(base + 1)
    val newLo = lo + pLo
    // unsigned add wraps iff the result is (unsigned-)below an operand
    val carry = if (java.lang.Long.compareUnsigned(newLo, lo) < 0) 1L else 0L
    buf(base) = buf(base) + pHi + carry
    buf(base + 1) = newLo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    require(v != null, "moment_matrix: null vector row")
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dim,
      s"moment_matrix: vector length ${arr.numElements()} != dim $dim")
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = arr.getLong(i); i += 1 }
    var cell = 0
    i = 0
    while (i < dim) {
      val qi = q(i)
      var j = i
      while (j < dim) {
        val qj = q(j)
        add128(buf, cell, Math.multiplyHigh(qi, qj), qi * qj)
        cell += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var cell = 0
    while (cell < nCells) {
      add128(buf, cell, other(cell << 1), other((cell << 1) + 1))
      cell += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](nCells)
    var cell = 0
    var i = 0
    var j = 0
    while (cell < nCells) {
      val hi = buf(cell << 1)
      val lo = buf((cell << 1) + 1)
      val big = java.math.BigInteger.valueOf(hi).shiftLeft(64)
        .add(new java.math.BigInteger(1, {
          val b = new Array[Byte](8)
          var k = 0
          while (k < 8) { b(k) = (lo >>> (56 - 8 * k)).toByte; k += 1 }
          b
        }))
      val dec = org.apache.spark.sql.types.Decimal(
        scala.math.BigDecimal(scala.math.BigInt(big)), 38, 0)
      out(cell) = InternalRow(i, j, dec)
      if (j == dim - 1) { i += 1; j = i } else j += 1
      cell += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8 + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var k = 0
    while (k < buf.length) { out.writeLong(buf(k)); k += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var k = 0
    while (k < n) { buf(k) = in.readLong(); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object MomentMatrix {
  /** `momentMatrix(vec, dim)` aggregate Column over an `array<bigint>`
    * column of fixed length `dim`: upper-triangle exact product sums
    * as `array<struct<i, j, s decimal(38,0)>>`.
    */
  def momentMatrix(vec: Column, dim: Int): Column =
    ColumnBridge.column(
      MomentMatrix(ColumnBridge.expression(vec), dim).toAggregateExpression())
}
