package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  * Scale: buffer is O(k) per group; partial aggregation (map-side
  * bottom-k) merges associatively — the same shape HLL/t-digest sketches
  * use. */
case class BottomKByHash(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(String, Long)]] {

  override def createAggregationBuffer(): mutable.ArrayBuffer[(String, Long)] =
    mutable.ArrayBuffer.empty

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def trim(buf: mutable.ArrayBuffer[(String, Long)]): Unit =
    if (buf.length > k) {
      val kept = buf.sortBy(_._1).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: mutable.ArrayBuffer[(String, Long)],
      input: InternalRow): mutable.ArrayBuffer[(String, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      buf += ((md5hex(id.toString), id))
      trim(buf)
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(String, Long)],
      other: mutable.ArrayBuffer[(String, Long)]): mutable.ArrayBuffer[(String, Long)] = {
    buf ++= other
    trim(buf)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(String, Long)]): Any =
    new GenericArrayData(buf.sortBy(_._1).take(k).map(_._2).toArray)

  override def serialize(buf: mutable.ArrayBuffer[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (h, id) => out.writeUTF(h); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(String, Long)]
    (0 until n).foreach(_ => buf += ((in.readUTF(), in.readLong())))
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
