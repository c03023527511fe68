package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Memory-capped frequency counter — the reference's `CappedCounter`
  * (`logger.py:13-43`) as a native Catalyst
  * `TypedImperativeAggregate`: count string keys; when the key set
  * exceeds `maxKeys`, keep only the top half by frequency (an
  * approximate heavy-hitters sketch à la space-saving).
  *
  * Spark executes this with proper partial aggregation: per-partition
  * buffers update locally (A1/A4's partial→final merge for free), the
  * cap bounds executor memory no matter how many distinct error
  * strings a 100 TB run produces, and `merge` re-caps after combining
  * partials.
  *
  * Output: `map<string,bigint>`, entries ordered by (-count, key) so
  * results are deterministic and `to_json` is stable.
  */
case class CappedCounter(
    child: Expression,
    maxKeys: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  // cap < 2 would make trim() keep take(maxKeys/2) = 0 keys and
  // silently empty the aggregate on every overflow
  require(maxKeys >= 2, s"capped_counter cap must be >= 2, got $maxKeys")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "capped_counter"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Keep the `maxKeys/2` most frequent keys (logger.py:21-26). */
  private def trim(buf: mutable.HashMap[String, Long]): Unit = {
    if (buf.size > maxKeys) {
      val keep = buf.toSeq.sortBy { case (k, n) => (-n, k) }.take(maxKeys / 2)
      buf.clear()
      buf ++= keep
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.toString
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
      trim(buf)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, n) => buf.update(k, buf.getOrElse(k, 0L) + n) }
    trim(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, n) => (-n, k) }
    ArrayBasedMapData(
      sorted.map(e => UTF8String.fromString(e._1)).toArray,
      sorted.map(_._2).toArray)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // Length-prefixed UTF-8 (not writeUTF: that throws past 64 KiB keys,
    // and this aggregate is SQL-registered over arbitrary strings).
    buf.foreach { case (k, n) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(n)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val k = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      buf.update(k, in.readLong()); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCounter =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCounter =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CappedCounter {
  /** Column form: `capped_counter(c, maxKeys)` aggregate. */
  def cappedCounter(c: Column, maxKeys: Int = 100000): Column =
    ColumnBridge.column(
      CappedCounter(ColumnBridge.expression(c), maxKeys).toAggregateExpression())
}
