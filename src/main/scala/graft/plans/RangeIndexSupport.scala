package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BaseOrdering, JoinedRow, UnsafeProjection, UnsafeRow}

/** Machinery shared by the two broadcast range-join execs
  * ([[BroadcastRangeJoinExec]] unkeyed, [[KeyedBroadcastRangeJoinExec]]
  * keyed) — ONE copy of the concurrency-sensitive cache and of the
  * probe-walk correctness logic (r9 review: the first keyed cut
  * duplicated both line-for-line).
  *
  * Floating-point caveat (applies to both execs, documented here once):
  * bounds comparisons use a generated ASCENDING ordering, under which
  * -0.0 < 0.0 strictly (java.lang.Double.compare semantics), while
  * Spark's native BETWEEN codegen treats them equal; a probe of 0.0
  * against a bound of -0.0 (and vice versa) can therefore diverge from
  * the BroadcastNestedLoopJoin form on FloatType/DoubleType ranges.
  * Keys are stricter still — the keyed lookup is UnsafeRow
  * byte-equality, where -0.0 ≠ 0.0 and NaN payloads differ, so
  * floating-point KEY types are rejected outright at plan construction
  * (the native equi-join would normalize them via
  * NormalizeFloatingNumbers). */
private[plans] object RangeIndexSupport {

  /** One lo-sorted interval group: bounds, payload rows, and the
    * running max of hi in lo-order. Immutable after construction
    * (UnsafeRow copies) — safe to share across task threads. */
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

  /** Probe one group: binary-search the last interval with lo ≤ x, then
    * walk left emitting containing intervals, early-exiting when the
    * running-max-hi drops below x. Emits joined+projected output rows.
    * The caller passes an already-copied left row. */
  def probe(g: RangeIndex, cmp: BaseOrdering, x: UnsafeRow,
      lCopy: InternalRow, joined: JoinedRow, outProj: UnsafeProjection)
      : Iterator[InternalRow] = {
    var a = 0; var b = g.lo.length - 1; var ub = -1
    while (a <= b) {
      val mid = (a + b) >>> 1
      if (cmp.compare(g.lo(mid), x) <= 0) { ub = mid; a = mid + 1 }
      else b = mid - 1
    }
    if (ub < 0) Iterator.empty
    else new Iterator[InternalRow] {
      private var idx = ub
      private var nextRow: InternalRow = advance()
      private def advance(): InternalRow = {
        while (idx >= 0 && cmp.compare(g.maxHi(idx), x) >= 0) {
          val i = idx
          idx -= 1
          if (cmp.compare(g.hi(i), x) >= 0)
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

  /** Executor-side build cache shared by both execs (ADVICE r8 + r9
    * review): the sorted index is a property of the broadcast value, so
    * build once per executor and share across tasks. Keyed by
    * (broadcast id, exec node id) — exec ids are globally unique, so
    * the two operators' entries never collide. Design:
    *  - SoftReference values: a finished query's index (a full deep
    *    copy of its broadcast build side) is GC-reclaimable under
    *    memory pressure instead of pinned until eviction;
    *  - get-or-build is per-key (`compute` holds only the key's bin
    *    lock), so a slow build — including the broadcast fetch — never
    *    blocks hits or builds on UNRELATED keys;
    *  - a crude size backstop clears the whole map past 16 entries
    *    (rebuild is cheap relative to any query that needs it; order
    *    tracking isn't worth the locking it would reintroduce). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Long, Int), java.lang.ref.SoftReference[AnyRef]]()

  def getOrBuild[T <: AnyRef](key: (Long, Int))(build: => T): T = {
    val ref = cache.get(key)
    val hit = if (ref != null) ref.get else null
    if (hit != null) return hit.asInstanceOf[T]
    if (cache.size > 16) cache.clear()
    val out = cache.compute(key, (_, old) => {
      val prev = if (old != null) old.get else null
      if (prev != null) old
      else new java.lang.ref.SoftReference[AnyRef](build)
    }).get
    // GC cleared the SoftReference between compute and get (rare):
    // serve this task a private build rather than loop
    if (out != null) out.asInstanceOf[T] else build
  }
}
