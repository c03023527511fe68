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
  extends TypedImperativeAggregate[TopKByScore.Buf] {

  require(k > 0)

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
                   StructField("id", LongType, nullable = false))), containsNull = false)

  import TopKByScore.{Buf, ord}

  override def createAggregationBuffer(): Buf =
    new Buf(new java.util.TreeMap[(Double, Long), Int](ord), 0)

  // Multiplicity-aware: a duplicated (score, id) input row occupies
  // TWO of the k slots, exactly like row_number() over the window
  // formulation would rank both copies — a plain TreeSet silently
  // collapsed duplicates and could return < k rows.
  private def add(buf: Buf, s: Double, i: Long, times: Int): Unit = {
    var t = times
    while (t > 0) {
      if (buf.total < k) {
        buf.map.merge((s, i), 1, (a, b) => a + b); buf.total += 1
      } else if (ord.compare((s, i), buf.map.firstKey()) > 0) {
        val worst = buf.map.firstKey()
        val n = buf.map.get(worst)
        if (n == 1) buf.map.remove(worst) else buf.map.put(worst, n - 1)
        buf.map.merge((s, i), 1, (a, b) => a + b)
      } else return // this and remaining copies can't displace anything
      t -= 1
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      add(buf, s.asInstanceOf[Double], i.asInstanceOf[Long], 1)
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey._1, e.getKey._2, e.getValue)
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    // descending (best first): the map iterates worst→best, reverse.
    val arr = new Array[Any](buf.total)
    val it = buf.map.descendingMap().entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      var n = e.getValue
      while (n > 0) { arr(j) = InternalRow(e.getKey._1, e.getKey._2); j += 1; n -= 1 }
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.map.size())
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e.getKey._1); out.writeLong(e.getKey._2); out.writeInt(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val key = (in.readDouble(), in.readLong())
      val c = in.readInt()
      buf.map.put(key, c); buf.total += c
      j += 1
    }
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
  /** Aggregation buffer: (score, id) → multiplicity, ordered
    * worst-first so `firstKey` is the eviction candidate; `total` is
    * the occupied slot count (Σ multiplicities), capped at k.
    */
  final class Buf(val map: java.util.TreeMap[(Double, Long), Int], var total: Int)

  private[plans] val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (s, -i) }

  /** `topKByScore(score, id, k)` aggregate Column. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
