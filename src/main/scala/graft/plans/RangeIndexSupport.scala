package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BaseOrdering, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.physical.BroadcastMode

/** Machinery shared by the three broadcast range-join execs
  * ([[BroadcastRangeJoinExec]] containment, [[BroadcastOverlapJoinExec]]
  * overlap, [[KeyedBroadcastRangeJoinExec]] keyed) — ONE copy of the
  * index build, the probe-walk correctness logic, and the custom
  * broadcast modes (r9 review: the first keyed cut duplicated the
  * build/walk line-for-line).
  *
  * Floating-point caveat (applies to all three execs, documented here
  * once): bounds comparisons use a generated ASCENDING ordering, under
  * which -0.0 < 0.0 strictly (java.lang.Double.compare semantics),
  * while Spark's native BETWEEN codegen treats them equal; a probe of
  * 0.0 against a bound of -0.0 (and vice versa) can therefore diverge
  * from the BroadcastNestedLoopJoin form on FloatType/DoubleType
  * ranges. Keys are stricter still — the keyed lookup is UnsafeRow
  * byte-equality, where -0.0 ≠ 0.0 and NaN payloads differ, so
  * floating-point KEY types are rejected outright at plan construction
  * (the native equi-join would normalize them via
  * NormalizeFloatingNumbers). */
private[graft] object RangeIndexSupport {
  import org.apache.spark.sql.execution.graftshim.DriverBuiltRelation

  /** One lo-sorted interval group: bounds, payload rows, and the
    * running max of hi in lo-order. Immutable after construction
    * (UnsafeRow copies) — safe to share across task threads and to
    * Java-serialize inside a broadcast. */
  final case class RangeIndex(lo: Array[InternalRow],
      hi: Array[InternalRow], rows: Array[InternalRow],
      maxHi: Array[InternalRow]) {
    def isEmpty: Boolean = lo.isEmpty
  }

  /** Sort collected (lo, hi, row) interval copies by lo and attach the
    * running-max-hi array. */
  def buildIndex(raw: Array[(InternalRow, InternalRow, InternalRow)],
      cmp: BaseOrdering): RangeIndex = {
    val ivs = raw.sortWith((a, b) => cmp.compare(a._1, b._1) < 0)
    val maxHi = new Array[InternalRow](ivs.length)
    var m = 0
    while (m < ivs.length) {
      maxHi(m) =
        if (m == 0) ivs(0)._2
        else if (cmp.compare(ivs(m)._2, maxHi(m - 1)) >= 0) ivs(m)._2
        else maxHi(m - 1)
      m += 1
    }
    RangeIndex(ivs.map(_._1), ivs.map(_._2), ivs.map(_._3), maxHi)
  }

  /** Probe one group with a point x: binary-search the last interval
    * with lo ≤ x, then walk left emitting containing intervals,
    * early-exiting when the running-max-hi drops below x. Emits
    * joined+projected output rows. The caller passes an already-copied
    * left row. Containment is the s = e = x special case of overlap. */
  def probe(g: RangeIndex, cmp: BaseOrdering, x: UnsafeRow,
      lCopy: InternalRow, joined: JoinedRow, outProj: UnsafeProjection)
      : Iterator[InternalRow] =
    probeOverlap(g, cmp, x, x, lCopy, joined, outProj)

  /** Probe one group with an INTERVAL [s, e]: emit every build interval
    * [lo, hi] with lo ≤ e AND hi ≥ s (inclusive overlap — touching
    * endpoints count). Same walk as the point probe: binary-search the
    * last lo ≤ e, walk left while the running-max-hi can still reach s.
    * A build interval strictly inside [s, e], one containing it, and
    * partial overlaps on either side all satisfy the two comparisons —
    * one walk covers every overlap taxonomy case. */
  def probeOverlap(g: RangeIndex, cmp: BaseOrdering, s: UnsafeRow,
      e: UnsafeRow, lCopy: InternalRow, joined: JoinedRow,
      outProj: UnsafeProjection): Iterator[InternalRow] = {
    var a = 0; var b = g.lo.length - 1; var ub = -1
    while (a <= b) {
      val mid = (a + b) >>> 1
      if (cmp.compare(g.lo(mid), e) <= 0) { ub = mid; a = mid + 1 }
      else b = mid - 1
    }
    if (ub < 0) Iterator.empty
    else new Iterator[InternalRow] {
      private var idx = ub
      private var nextRow: InternalRow = advance()
      private def advance(): InternalRow = {
        while (idx >= 0 && cmp.compare(g.maxHi(idx), s) >= 0) {
          val i = idx
          idx -= 1
          if (cmp.compare(g.hi(i), s) >= 0)
            return outProj(joined(lCopy, g.rows(i))).copy()
        }
        null
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; nextRow = advance(); r
      }
    }
  }

  /** The generated ascending ordering used for every index sort and
    * probe comparison — one definition so driver (mode.transform) and
    * executors (probe walks) provably agree. Cheap after the first
    * codegen-cache hit; generated per call site because generated
    * orderings are not provably thread-safe. */
  def ordering(dt: org.apache.spark.sql.types.DataType): BaseOrdering = {
    val vAttr = AttributeReference("v", dt, nullable = true)() :: Nil
    GenerateOrdering.generate(vAttr.map(SortOrder(_, Ascending)), vAttr)
  }

  private def sizeOf(rows: Iterable[InternalRow]): Long =
    rows.iterator.map {
      case u: UnsafeRow => u.getSizeInBytes.toLong
      case _ => 64L
    }.sum

  /** Custom [[BroadcastMode]] (the HashedRelationBroadcastMode
    * precedent, closing ADVICE r8 the way it suggested): the exchange
    * runs `transform` ONCE on the driver, so the O(M log M) sort and
    * the per-interval row copies happen exactly once per query — not
    * once per task (the r8 state) or once per executor (the r9 interim
    * SoftReference cache, now deleted) — and what ships over the wire
    * is the READY index, never the raw row array. Cross-query reuse is
    * Spark's own broadcast-exchange reuse (ReusedExchange), which this
    * mode joins for free via case-class equality of its canonicalized
    * form. */
  case class RangeIndexBroadcastMode(loExpr: Expression, hiExpr: Expression,
      output: Seq[Attribute]) extends BroadcastMode {
    override def transform(rows: Array[InternalRow]): AnyRef =
      transform(rows.iterator, Some(rows.length.toLong))
    override def transform(rows: Iterator[InternalRow],
        sizeHint: Option[Long]): AnyRef = {
      val loProj = UnsafeProjection.create(loExpr :: Nil, output)
      val hiProj = UnsafeProjection.create(hiExpr :: Nil, output)
      val buf = new scala.collection.mutable.ArrayBuffer[
        (InternalRow, InternalRow, InternalRow)]()
      rows.foreach { row =>
        val lo = loProj(row)
        val hi = hiProj(row)
        if (!lo.isNullAt(0) && !hi.isNullAt(0))
          buf += ((lo.copy(), hi.copy(), row.copy()))
      }
      val idx = buildIndex(buf.toArray, ordering(loExpr.dataType))
      new DriverBuiltRelation(idx,
        sizeOf(idx.rows) + sizeOf(idx.lo) + sizeOf(idx.hi))
    }
    override def canonicalized: BroadcastMode =
      copy(loExpr = loExpr.canonicalized, hiExpr = hiExpr.canonicalized,
        output = Seq.empty)
  }

  /** Keyed variant: hash-partition by key, each group lo-sorted with
    * its running-max-hi. Null keys and null bounds are dropped at
    * build (they can match nothing under the join's SQL semantics). */
  case class KeyedRangeIndexBroadcastMode(keyExpr: Expression,
      loExpr: Expression, hiExpr: Expression, output: Seq[Attribute])
      extends BroadcastMode {
    override def transform(rows: Array[InternalRow]): AnyRef =
      transform(rows.iterator, Some(rows.length.toLong))
    override def transform(rows: Iterator[InternalRow],
        sizeHint: Option[Long]): AnyRef = {
      val keyProj = UnsafeProjection.create(keyExpr :: Nil, output)
      val loProj = UnsafeProjection.create(loExpr :: Nil, output)
      val hiProj = UnsafeProjection.create(hiExpr :: Nil, output)
      val byKey = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.ArrayBuffer[
          (InternalRow, InternalRow, InternalRow)]]()
      var size = 0L
      rows.foreach { row =>
        val k = keyProj(row)
        val lo = loProj(row)
        val hi = hiProj(row)
        if (!k.isNullAt(0) && !lo.isNullAt(0) && !hi.isNullAt(0)) {
          var buf = byKey.get(k)
          if (buf == null) {
            buf = new scala.collection.mutable.ArrayBuffer()
            byKey.put(k.copy(), buf)
          }
          buf += ((lo.copy(), hi.copy(), row.copy()))
          size += (row match {
            case u: UnsafeRow => u.getSizeInBytes.toLong + 16L
            case _ => 80L
          })
        }
      }
      val cmp = ordering(loExpr.dataType)
      val out = new java.util.HashMap[UnsafeRow, RangeIndex](
        byKey.size * 2)
      byKey.forEach { (k, buf) =>
        out.put(k, buildIndex(buf.toArray, cmp))
      }
      new DriverBuiltRelation(out, size)
    }
    override def canonicalized: BroadcastMode =
      copy(keyExpr = keyExpr.canonicalized, loExpr = loExpr.canonicalized,
        hiExpr = hiExpr.canonicalized, output = Seq.empty)
  }
}
