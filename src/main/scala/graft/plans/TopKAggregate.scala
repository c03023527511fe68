package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k by score as a `TypedImperativeAggregate` — the
  * scale-correct shape for "k best per key": each partition keeps a
  * k-bounded heap (map-side partial aggregation), so the shuffle
  * carries k rows per key per partition instead of EVERY scored row
  * the way a `Window`+`row_number` plan does. For brute-force ANN over
  * a 100 TB corpus that is the difference between shuffling |corpus|
  * and shuffling k·partitions rows.
  *
  * Total order: score DESC, then id ASC (deterministic ties) — exactly
  * the `row_number() OVER (ORDER BY score DESC, id)` order, so results
  * are bit-identical to the window formulation.
  *
  * Input: two child expressions (score double, id long).
  * Output: array<struct<score double, id bigint>> sorted by the order.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  require(k > 0)

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
                   StructField("id", LongType, nullable = false))), containsNull = false)

  // TreeSet ordered worst-first so .first() is the eviction candidate.
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (s, -i) }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  private def add(buf: java.util.TreeSet[(Double, Long)], s: Double, i: Long): Unit = {
    if (buf.size < k) buf.add((s, i))
    else if (ord.compare((s, i), buf.first()) > 0) { buf.pollFirst(); buf.add((s, i)) }
  }

  override def update(buf: java.util.TreeSet[(Double, Long)], input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      add(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Long)], other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (s, i) = it.next(); add(buf, s, i) }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    // descending (best first): TreeSet iterates worst→best, reverse it.
    val arr = new Array[Any](buf.size)
    val it = buf.descendingIterator()
    var j = 0
    while (it.hasNext) {
      val (s, i) = it.next()
      arr(j) = InternalRow(s, i)
      j += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.add((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKByScore {
  /** `topKByScore(score, id, k)` aggregate Column. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
