package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic bottom-k-by-hash sampler as a `TypedImperativeAggregate`
  * (the sketch-style custom-aggregate API: mutable buffer, explicit
  * serialization, partial merge).
  *
  * Semantics: keep the k ids whose md5(id) hex digest sorts lowest —
  * "consistent sampling": order-independent (any partitioning/merge order
  * yields the same set), stable across runs and engines, and uniform in
  * expectation. The DuckDB oracle is
  * `(array_agg(id ORDER BY md5(CAST(id AS VARCHAR))))[1:k]`, so this
  * custom aggregate is differential-tested like every built-in.
  *
  * Scale: the buffer is a bounded MAX-heap of size k ordered by
  * (hash, id) — once warm, a non-qualifying row is rejected with a single
  * comparison against the heap head (O(1)), and a qualifying row costs
  * O(log k); nothing ever sorts per input row. Partial aggregation
  * (map-side bottom-k) merges associatively — the same shape HLL/t-digest
  * sketches use. */
case class BottomKByHash(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]] {

  // Max-heap: head is the largest kept (hash, id) — the eviction victim.
  // Full-tuple ordering so hash ties (if md5 ever collided) stay
  // deterministic under any merge order.
  private val ord: Ordering[(String, Long)] =
    Ordering.Tuple2(Ordering.String, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    mutable.PriorityQueue.empty(ord)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def insert(buf: mutable.PriorityQueue[(String, Long)],
      e: (String, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }

  override def update(buf: mutable.PriorityQueue[(String, Long)],
      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      insert(buf, (md5hex(id.toString), id))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(String, Long)],
      other: mutable.PriorityQueue[(String, Long)]): mutable.PriorityQueue[(String, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(ord).map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, id) => out.writeUTF(h); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((in.readUTF(), in.readLong())))
    buf
  }

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(offset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKByHash =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SampleAggregates {
  /** Column API: deterministic k-sample of a long id column per group. */
  def bottomKByHash(c: Column, k: Int): Column =
    Shim.column(BottomKByHash(Shim.expression(c), k)
      .toAggregateExpression(isDistinct = false))
}
