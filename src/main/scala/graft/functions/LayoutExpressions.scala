package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}

/** Data-layout expressions: Z-order (Morton) interleaving for
  * multi-dimensional clustering.
  *
  * At 100 TB the scan is the cost, and the scan is only cheap when file
  * min/max statistics prune; a sort by one column gives tight stats on
  * that column alone. Writing data ordered by the Morton code of two
  * range-normalized dimensions gives every file a bounded rectangle in
  * BOTH dims, so predicates on either prune files — the standard layout
  * trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) expressed as a plain
  * codegen'd expression + `repartitionByRange(zvalue)` write.
  *
  * The interleave is pure 64-bit mask/shift arithmetic (the magic-number
  * bit-spread), so the exact same computation is expressible in DuckDB
  * SQL — the z-values themselves are oracle-checkable, engine-neutral.
  */
object ZValue {
  private final val M16 = 0x0000FFFF0000FFFFL
  private final val M8 = 0x00FF00FF00FF00FFL
  private final val M4 = 0x0F0F0F0F0F0F0F0FL
  private final val M2 = 0x3333333333333333L
  private final val M1 = 0x5555555555555555L

  /** Spread the low 31 bits of v to even bit positions 0,2,...,60. */
  def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & M16
    x = (x | (x << 8)) & M8
    x = (x | (x << 4)) & M4
    x = (x | (x << 2)) & M2
    x = (x | (x << 1)) & M1
    x
  }

  /** Morton code of (x, y): x in even bits, y in odd. Inputs are taken
    * modulo 2^31 (range-normalize dimensions first, as any z-order
    * writer does); result is non-negative (< 2^62). */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** Column form. */
  def zvalue(x: Column, y: Column): Column =
    Shim.column(ZValueExpr(Shim.expression(x), Shim.expression(y)))

  /** The same bit-spread as a DuckDB SQL expression (for oracle SQL):
    * textually expanded mask/shift chain — identical arithmetic, so
    * Spark and DuckDB agree bit-for-bit. */
  def spreadSql(e: String): String = {
    val s0 = s"(($e) & 2147483647)"
    val s1 = s"((($s0 | ($s0 << 16)) & ${M16}))"
    val s2 = s"((($s1 | ($s1 << 8)) & ${M8}))"
    val s3 = s"((($s2 | ($s2 << 4)) & ${M4}))"
    val s4 = s"((($s3 | ($s3 << 2)) & ${M2}))"
    s"((($s4 | ($s4 << 1)) & ${M1}))"
  }

  def zvalueSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
}

/** Native codegen'd Morton-code expression: stays inside whole-stage
  * codegen (one static call, no boxing), null iff an input is null. */
case class ZValueExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zvalue requires (bigint, bigint) inputs, got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZValue.interleave($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ZValueExpr = copy(left = l, right = r)
}

/** Hilbert-curve index — the locality-tighter alternative to Morton
  * order for 2-D write layout. Consecutive Hilbert positions are always
  * grid-adjacent (no Morton "jumps" across the plane), so files cut
  * from a Hilbert-sorted stream have strictly tighter x/y min-max
  * rectangles at the same file size — better pruning for the same
  * write cost (the reason Delta chose Hilbert for OPTIMIZE in newer
  * versions).
  *
  * 16 bits per coordinate (range-normalize first, as with zvalue). The
  * classic per-bit rotate-and-accumulate walk (Wikipedia xy2d) runs as
  * a fixed 16-iteration loop of integer ops in one static call — fully
  * inside whole-stage codegen. The identical iteration is expressible
  * as a DuckDB recursive CTE, so Hilbert values are oracle-checkable
  * like z-values: engine-neutral integer arithmetic.
  */
object HilbertValue {
  final val Bits = 16
  final val N: Long = 1L << Bits // 65536 cells per side

  /** Map (x, y) — each taken modulo 2^16 — to its Hilbert distance d in
    * [0, 2^32). Curve starts at (0,0). */
  def xy2d(cx: Long, cy: Long): Long = {
    var x = cx & (N - 1)
    var y = cy & (N - 1)
    var d = 0L
    var s = N >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate quadrant
        if (rx == 1) { x = N - 1 - x; y = N - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column form. */
  def hilbert(x: Column, y: Column): Column =
    Shim.column(HilbertExpr(Shim.expression(x), Shim.expression(y)))

  /** Decompose the inclusive 2-D box [xlo,xhi]×[ylo,yhi] into disjoint,
    * sorted Hilbert-distance ranges that cover exactly the box's cells
    * (then coarsened to ≤ maxRanges by closing the smallest inter-range
    * gaps — a superset, safe under the exact box residual filter every
    * curve-range read applies anyway).
    *
    * This is the READ-side planning step the Hilbert layout needs that
    * Morton order gets for free: z(lo,lo)..z(hi,hi) bounds a 2-D box
    * because bit-interleaving is monotone per dimension, but Hilbert's
    * rotations break corner-monotonicity, so a box maps to a SET of
    * d-ranges. The decomposition walks the quadtree: an aligned 2^k-cell
    * is a contiguous d-block of length 4^k starting at a multiple of 4^k
    * (the defining Hilbert recursion property), so fully-contained cells
    * emit their block and partial cells recurse — O(perimeter·log N)
    * cells visited, pure driver-side geometry on query CONSTANTS (no
    * data touched; the same planning any curve-indexed store does). */
  def boxRanges(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
      maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(xlo <= xhi && ylo <= yhi && xlo >= 0 && ylo >= 0 &&
      xhi < N && yhi < N, s"box out of the $N×$N grid")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def emit(x0: Long, y0: Long, s: Long): Unit = {
      val sz = s * s
      val base = (xy2d(x0, y0) / sz) * sz
      buf += ((base, base + sz - 1))
    }
    def walk(x0: Long, y0: Long, s: Long): Unit = {
      val x1 = x0 + s - 1; val y1 = y0 + s - 1
      if (x1 < xlo || x0 > xhi || y1 < ylo || y0 > yhi) ()
      else if ((x0 >= xlo && x1 <= xhi && y0 >= ylo && y1 <= yhi) || s == 1L)
        emit(x0, y0, s)
      else {
        val h = s >> 1
        walk(x0, y0, h); walk(x0 + h, y0, h)
        walk(x0, y0 + h, h); walk(x0 + h, y0 + h, h)
      }
    }
    walk(0L, 0L, N)
    // merge touching/overlapping ranges
    val merged = buf.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: tail, (l, h)) if l <= hi + 1 =>
        (lo, math.max(hi, h)) :: tail
      case (acc, r) => r :: acc
    }.reverse.toVector
    if (merged.size <= maxRanges) merged
    else {
      // close the (size - maxRanges) smallest gaps: keeps the extra cells
      // admitted by coarsening to a minimum
      val k = merged.size - maxRanges
      val gaps = merged.sliding(2).collect {
        case Seq((_, h), (l, _)) => l - h - 1
      }.toVector.sorted
      val cut = gaps(k - 1)
      // close every gap < cut, plus just enough == cut gaps to total k
      var eqToClose = k - gaps.count(_ < cut)
      merged.tail.foldLeft(List(merged.head)) {
        case ((lo, hi) :: tail, (l, h)) =>
          val gap = l - hi - 1
          val close = gap < cut ||
            (gap == cut && eqToClose > 0 && { eqToClose -= 1; true })
          if (close) (lo, math.max(hi, h)) :: tail
          else (l, h) :: (lo, hi) :: tail
        case (acc, r) => r :: acc // unreachable; exhaustivity
      }.reverse.toVector
    }
  }

  /** The same walk as a DuckDB recursive CTE body. `src` must expose
    * (key, x, y); the produced CTE `_hilbert` exposes (key, hval). */
  def hilbertCteSql(src: String): String =
    s"""_hraw AS (
         SELECT key, x & 65535 AS x, y & 65535 AS y,
           CAST(0 AS BIGINT) AS d, CAST(32768 AS BIGINT) AS s
         FROM $src
       UNION ALL
         SELECT key,
           CASE WHEN (y & s) != 0 THEN x
                WHEN (x & s) != 0 THEN 65535 - y ELSE y END AS x,
           CASE WHEN (y & s) != 0 THEN y
                WHEN (x & s) != 0 THEN 65535 - x ELSE x END AS y,
           d + s * s * (CASE WHEN (y & s) != 0
             THEN (CASE WHEN (x & s) != 0 THEN 2 ELSE 1 END)
             ELSE (CASE WHEN (x & s) != 0 THEN 3 ELSE 0 END) END) AS d,
           s // 2 AS s
         FROM _hraw WHERE s >= 1),
       _hilbert AS (SELECT key, d AS hval FROM _hraw WHERE s = 0)"""
}

/** Sorted-disjoint-range containment: `value ∈ ⋃ [los(i), his(i)]` via
  * one binary search — the read-side predicate for curve-range scans.
  *
  * Why an expression and not `OR`-of-`BETWEEN`s: the filter sits right
  * above the project that computes the curve key, so Catalyst collapses
  * them and INLINES the key expression into every comparison — with 64
  * ranges that re-ran the 16-iteration Hilbert walk ~128× per row
  * (measured 5.3 s vs z-order's 0.24 s on the same box query). Here the
  * child is evaluated ONCE and the ranges live in two sorted arrays
  * behind a static binary search — O(log R) per row, one small codegen
  * call instead of a 128-term comparison tree. */
case class InLongRanges(child: Expression, los: Array[Long],
    his: Array[Long]) extends UnaryExpression {
  require(los.length == his.length && los.nonEmpty, "empty range set")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"in_long_ranges requires a bigint input, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "in_long_ranges"

  override def nullSafeEval(v: Any): Any =
    InLongRanges.contains(v.asInstanceOf[Long], los, his)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val losRef = ctx.addReferenceObj("los", los, "long[]")
    val hisRef = ctx.addReferenceObj("his", his, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.InLongRanges.contains($c, $losRef, $hisRef);")
  }

  override protected def withNewChildInternal(c: Expression): InLongRanges =
    copy(child = c)
}

object InLongRanges {
  /** Rightmost lo <= v (binary search), then test v <= its hi. */
  def contains(v: Long, los: Array[Long], his: Array[Long]): Boolean = {
    var lo = 0
    var hi = los.length - 1
    var found = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (los(mid) <= v) { found = mid; lo = mid + 1 } else hi = mid - 1
    }
    found >= 0 && v <= his(found)
  }

  /** Column form over a sorted, disjoint range set. */
  def inRanges(c: Column, ranges: Seq[(Long, Long)]): Column =
    Shim.column(InLongRanges(Shim.expression(c),
      ranges.map(_._1).toArray, ranges.map(_._2).toArray))
}

/** Native codegen'd Hilbert-index expression (see [[HilbertValue]]). */
case class HilbertExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert requires (bigint, bigint) inputs, got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertValue.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertValue.xy2d($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): HilbertExpr = copy(left = l, right = r)
}
