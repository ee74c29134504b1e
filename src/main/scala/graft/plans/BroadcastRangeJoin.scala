package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.Shim

/** Custom whole-operator #3: BROADCAST RANGE (interval-containment)
  * join — `probe.x BETWEEN build.lo AND build.hi` against a small
  * interval dimension (rate bands, time windows, SLA tiers, histogram
  * bins). The §8 depth candidate, generalizing the banded rewrites
  * (BinTimeRangeJoin / q_theta_hist) into a first-class operator.
  *
  * Why not built-ins: Spark plans a non-equi theta join against a
  * small side as BroadcastNestedLoopJoin — O(|probe|·|build|)
  * predicate evaluations. The engine's composable escape hatches
  * (bin-and-explode equi-join; threshold-array histogram) work but
  * impose a grid or a rewrite per query. This exec keeps the natural
  * range-predicate form and probes in O(log |build| + matches) per
  * row:
  *
  *  - `requiredChildDistribution`: probe side unconstrained, build
  *    side `BroadcastDistribution(IdentityBroadcastMode)` — Catalyst
  *    inserts the BroadcastExchange; at 100 TB the fact side never
  *    moves, exactly the broadcast-hash-join shape but for intervals;
  *  - per partition, the broadcast intervals are sorted by `lo` once,
  *    with a running max of `hi` in lo-order; a probe binary-searches
  *    the last interval with lo ≤ x, then walks left emitting
  *    containing intervals, stopping as soon as the running-max-hi
  *    drops below x — for non/moderately-overlapping bands the walk is
  *    O(matches), never O(|build|);
  *  - INNER semantics: null probe values and null bounds match
  *    nothing (SQL UNKNOWN), unmatched probe rows are dropped.
  *
  * Exactness: output is row-identical (as a multiset) to the
  * BroadcastNestedLoopJoin form, so the same DuckDB range-join oracle
  * checks both; RangeJoinSpec pins the equivalence and the boundary /
  * multi-match / null cases. */
case class RangeJoinPlan(probeExpr: Expression, loExpr: Expression,
    hiExpr: Expression, left: LogicalPlan, right: LogicalPlan)
    extends BinaryNode {
  require(probeExpr.dataType == loExpr.dataType &&
    probeExpr.dataType == hiExpr.dataType,
    "range join probe/lo/hi types must match")
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan,
      r: LogicalPlan): RangeJoinPlan = copy(left = l, right = r)
}

case class BroadcastRangeJoinExec(probeExpr: Expression, loExpr: Expression,
    hiExpr: Expression, left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = left.output
    val rSchema = right.output
    val pExpr = probeExpr; val loE = loExpr; val hiE = hiExpr
    val outAttrs = output
    val bc = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      // single-column dummy schema for cross-row value comparisons,
      // compared with a generated (codegen'd) ordering — the
      // AsOfJoinExec pattern
      val vAttr = AttributeReference("v", pExpr.dataType,
        nullable = true)() :: Nil
      val cmp = GenerateOrdering.generate(
        vAttr.map(SortOrder(_, Ascending)), vAttr)
      val probeProj = UnsafeProjection.create(pExpr :: Nil, lSchema)
      val loProj = UnsafeProjection.create(loE :: Nil, rSchema)
      val hiProj = UnsafeProjection.create(hiE :: Nil, rSchema)
      // build once per partition from the broadcast value: intervals
      // with non-null bounds, sorted by lo, plus the running max of hi
      val built = bc.value.flatMap { row =>
        val lo = loProj(row).copy()
        val hi = hiProj(row).copy()
        if (lo.isNullAt(0) || hi.isNullAt(0)) None
        else Some((lo, hi, row.copy()))
      }.sortWith((a, b) => cmp.compare(a._1, b._1) < 0)
      val maxHi = new Array[InternalRow](built.length)
      var m = 0
      while (m < built.length) {
        maxHi(m) =
          if (m == 0) built(0)._2
          else if (cmp.compare(built(m)._2, maxHi(m - 1)) >= 0) built(m)._2
          else maxHi(m - 1)
        m += 1
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      lIter.flatMap { lRow =>
        val x = probeProj(lRow)
        if (x.isNullAt(0) || built.isEmpty) Iterator.empty
        else {
          // binary search: last index with lo <= x
          var a = 0; var b = built.length - 1; var ub = -1
          while (a <= b) {
            val mid = (a + b) >>> 1
            if (cmp.compare(built(mid)._1, x) <= 0) { ub = mid; a = mid + 1 }
            else b = mid - 1
          }
          if (ub < 0) Iterator.empty
          else {
            val lCopy = lRow.copy()
            // walk left while some interval at-or-before idx can still
            // reach x (running max hi >= x)
            new Iterator[InternalRow] {
              private var idx = ub
              private var nextRow: InternalRow = advance()
              private def advance(): InternalRow = {
                while (idx >= 0 && cmp.compare(maxHi(idx), x) >= 0) {
                  val (_, hi, rRow) = built(idx)
                  idx -= 1
                  if (cmp.compare(hi, x) >= 0)
                    return outProj(joined(lCopy, rRow)).copy()
                }
                null
              }
              override def hasNext: Boolean = nextRow != null
              override def next(): InternalRow = {
                val r = nextRow; nextRow = advance(); r
              }
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan,
      r: SparkPlan): BroadcastRangeJoinExec = copy(left = l, right = r)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(p, lo, hi, l, r) =>
      BroadcastRangeJoinExec(p, lo, hi, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object RangeJoin {
  /** Inner broadcast range join: every (probe row, build row) pair with
    * `probe.probeCol BETWEEN build.loCol AND build.hiCol` (bounds
    * inclusive; nulls match nothing). Build-side columns are re-aliased
    * with `prefix` (fresh exprIds, collision-free — the asofJoin
    * contract). The build side must be broadcast-sized. */
  def broadcastRangeJoin(probe: DataFrame, build: DataFrame,
      probeCol: String, loCol: String, hiCol: String,
      prefix: String = "r_"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = probe.sparkSession
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy
    val renamed = build.select(
      build.columns.toIndexedSeq.map(c => col(c).as(prefix + c)): _*)
    val lPlan = probe.queryExecution.analyzed
    val rPlan = renamed.queryExecution.analyzed
    def resolve(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name)}"))
    Shim.ofRows(spark, RangeJoinPlan(
      resolve(lPlan, probeCol),
      resolve(rPlan, prefix + loCol),
      resolve(rPlan, prefix + hiCol),
      lPlan, rPlan))
  }
}
