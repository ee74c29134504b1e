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

  /** Probe-side rows pass through in place and in order (each emits its
    * matches consecutively), so the streamed side's partitioning and
    * ordering survive — forwarding them lets downstream operators reuse
    * the probe side's distribution instead of inserting an exchange
    * (the BroadcastHashJoinExec shape; ADVICE r8). */
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = left.output
    val rSchema = right.output
    val pExpr = probeExpr; val loE = loExpr; val hiE = hiExpr
    val outAttrs = output
    val execId = this.id
    val bc = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      // single-column dummy schema for cross-row value comparisons,
      // compared with a generated (codegen'd) ordering — the
      // AsOfJoinExec pattern. Generated per task (orderings are cheap
      // after the first codegen-cache hit and not provably
      // thread-safe); the built ARRAYS are shared via the cache.
      val vAttr = AttributeReference("v", pExpr.dataType,
        nullable = true)() :: Nil
      val cmp = GenerateOrdering.generate(
        vAttr.map(SortOrder(_, Ascending)), vAttr)
      val probeProj = UnsafeProjection.create(pExpr :: Nil, lSchema)
      // build-once per executor via the shared cache; the index build,
      // probe walk, and cache design live in RangeIndexSupport (one
      // copy for both range-join execs)
      val built = RangeIndexSupport.getOrBuild((bc.id, execId)) {
        val loProj = UnsafeProjection.create(loE :: Nil, rSchema)
        val hiProj = UnsafeProjection.create(hiE :: Nil, rSchema)
        RangeIndexSupport.buildIndex(
          bc.value.flatMap { row =>
            val lo = loProj(row).copy()
            val hi = hiProj(row).copy()
            if (lo.isNullAt(0) || hi.isNullAt(0)) None
            else Some((lo, hi, row.copy()))
          }, cmp)
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      lIter.flatMap { lRow =>
        val x = probeProj(lRow)
        if (x.isNullAt(0) || built.isEmpty) Iterator.empty
        else RangeIndexSupport.probe(built, cmp, x, lRow.copy(), joined,
          outProj)
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
    Strategies.ensureRegistered(spark, RangeJoinStrategy)
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
