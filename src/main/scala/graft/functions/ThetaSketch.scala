package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Theta sketch aggregate — distinct-count sketches that support SET
  * OPERATIONS (intersection, difference), which HLL fundamentally cannot:
  * HLL unions only, so "users who did A AND B" needs a raw re-scan, while
  * Theta answers it from two ~KB sketches. The audience-overlap /
  * cross-segment question a 100 TB event pipeline answers constantly
  * (the reference's dashboard re-queries raw Mongo per segment,
  * app.py:488-497).
  *
  * The aggregate builds a per-group sketch over a long key; set algebra
  * happens in [[ThetaSketch.intersectEstimate]]/[[ThetaSketch.aNotB]] on
  * the serialized sketches — typically over a HANDFUL of group sketches
  * (one per segment), so the algebra is cheap wherever it runs; the heavy
  * lifting (scanning raw rows into sketches) is the distributed agg.
  * Rows-only by design (hash-dependent, like q_approx_distinct);
  * SketchSpec pins the error bound and the intersection identity.
  */
case class ThetaSketchAgg(child: Expression, lgK: Int = 12,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArrayCompressed

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArrayCompressed
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ThetaSketch {
  /** Per-group Theta sketch of a long key column (serialized compact). */
  def thetaSketch(c: Column, lgK: Int = 12): Column =
    Shim.column(ThetaSketchAgg(Shim.expression(c), lgK)
      .toAggregateExpression(isDistinct = false))

  private def heapify(b: Array[Byte]): CompactSketch =
    CompactSketch.heapify(Memory.wrap(b))

  def estimate(sketch: Array[Byte]): Double = heapify(sketch).getEstimate

  /** |A ∩ B| estimate from two serialized sketches. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i: Intersection = SetOperation.builder().buildIntersection()
    i.intersect(heapify(a))
    i.intersect(heapify(b))
    i.getResult.getEstimate
  }

  /** |A \ B| estimate from two serialized sketches. */
  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double =
    Sketches.setOperationBuilder().buildANotB()
      .aNotB(heapify(a), heapify(b)).getEstimate

  /** |A ∪ B ∪ …| estimate from serialized sketches (the mergeable-
    * rollup readout — one sketch per segment in, one union estimate
    * out). */
  def unionEstimate(sketches: Seq[Array[Byte]], lgK: Int = 12): Double = {
    val u: Union = SetOperation.builder().setLogNominalEntries(lgK)
      .buildUnion()
    sketches.foreach(b => u.union(heapify(b)))
    u.getResult.getEstimate
  }
}
