package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.Shim

/** Custom whole-operator #5: broadcast interval-OVERLAP join —
  * `probe.[s, e] overlaps build.[lo, hi]` (inclusive: `lo ≤ e AND
  * hi ≥ s`), probe intervals against a small interval dimension. The
  * interval×interval generalization of [[BroadcastRangeJoinExec]]'s
  * point-in-interval probe: sessions × maintenance windows, stays ×
  * billing periods, reads × genomic features — the temporal/range
  * overlap shape.
  *
  * Why not built-ins: both overlap inequalities involve BOTH sides, so
  * there is no equi key and Spark plans BroadcastNestedLoopJoin —
  * O(|probe|·|build|) predicate evaluations. The composable escape
  * hatch (bin-and-explode BOTH sides into grid buckets + dedup, since
  * an overlapping pair can co-occur in many buckets) costs an explode
  * proportional to interval length over bucket width plus a distinct.
  * This exec keeps the natural predicate and probes the lo-sorted
  * index in O(log |build| + matches) per row: binary-search the last
  * build lo ≤ e, walk left while the running-max-hi can still reach s
  * (the [[RangeIndexSupport]] walk shared with the containment execs —
  * containment is its s = e special case).
  *
  *  - `requiredChildDistribution`: probe unconstrained, build side
  *    `BroadcastDistribution(RangeIndexBroadcastMode)` — the exchange
  *    builds the lo-sorted index ONCE on the driver and the fact side
  *    never moves (broadcast-hash-join shape, for interval overlap);
  *  - INNER semantics: a null endpoint on either side makes both SQL
  *    comparisons UNKNOWN, so such rows match nothing and drop;
  *  - probe rows pass through in place/in order → streamed-side
  *    partitioning and ordering forward.
  *
  * Exactness: output is row-identical (as a multiset) to the
  * BroadcastNestedLoopJoin `lo <= e AND hi >= s` form, so one DuckDB
  * overlap-join oracle checks both; RangeJoinSpec pins equivalence on
  * real session data plus the overlap taxonomy (touching endpoints,
  * probe-inside-build, build-inside-probe, disjoint both sides, empty
  * and reversed probe intervals, nulls). */
case class OverlapJoinPlan(probeLoExpr: Expression, probeHiExpr: Expression,
    loExpr: Expression, hiExpr: Expression,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  require(probeLoExpr.dataType == loExpr.dataType &&
    probeHiExpr.dataType == loExpr.dataType &&
    loExpr.dataType == hiExpr.dataType,
    "overlap join endpoint types must all match")
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan,
      r: LogicalPlan): OverlapJoinPlan = copy(left = l, right = r)
}

case class BroadcastOverlapJoinExec(probeLoExpr: Expression,
    probeHiExpr: Expression, loExpr: Expression, hiExpr: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  /** Build side broadcast as the DRIVER-BUILT lo-sorted index (the
    * HashedRelationBroadcastMode precedent — see RangeIndexSupport). */
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(RangeIndexSupport.RangeIndexBroadcastMode(
        loExpr, hiExpr, right.output)) :: Nil

  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = left.output
    val sE = probeLoExpr; val eE = probeHiExpr
    val outAttrs = output
    val bc = right.executeBroadcast[
      org.apache.spark.sql.execution.graftshim.DriverBuiltRelation]()
    left.execute().mapPartitions { lIter =>
      val cmp = RangeIndexSupport.ordering(sE.dataType)
      val sProj = UnsafeProjection.create(sE :: Nil, lSchema)
      val eProj = UnsafeProjection.create(eE :: Nil, lSchema)
      val built = bc.value.payload
        .asInstanceOf[RangeIndexSupport.RangeIndex]
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      lIter.flatMap { lRow =>
        // sProj and eProj share one backing buffer per projection
        // instance, but s must survive while e is evaluated — copy s
        val s = sProj(lRow).copy()
        val e = eProj(lRow)
        if (s.isNullAt(0) || e.isNullAt(0) || built.isEmpty) Iterator.empty
        else RangeIndexSupport.probeOverlap(built, cmp, s, e,
          lRow.copy(), joined, outProj)
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan,
      r: SparkPlan): BroadcastOverlapJoinExec = copy(left = l, right = r)
}

object OverlapJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case OverlapJoinPlan(s, e, lo, hi, l, r) =>
      BroadcastOverlapJoinExec(s, e, lo, hi,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object OverlapJoin {
  /** Inner broadcast overlap join: every (probe row, build row) pair
    * whose intervals overlap inclusively — `build.loCol <=
    * probe.probeHiCol AND build.hiCol >= probe.probeLoCol`. Touching
    * endpoints count; rows with a null endpoint match nothing; a
    * reversed probe interval (s > e) matches exactly what the SQL
    * predicate says (usually nothing unless a build interval spans the
    * whole reversal); so does a reversed BUILD interval (hi < lo,
    * matched exactly when the probe spans the whole reversal — kept by
    * BOTH plans, RangeJoinSpec pins it). Build-side columns are
    * re-aliased with `prefix` (fresh exprIds — the asofJoin contract).
    * A build side past the size ceiling degrades to the binned shuffle
    * plan when the bound type supports it ([[BinnedRangeFallback]]);
    * `forceBinned` scopes the flip to this call. */
  def broadcastOverlapJoin(probe: DataFrame, build: DataFrame,
      probeLoCol: String, probeHiCol: String, loCol: String,
      hiCol: String, prefix: String = "r_",
      forceBinned: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = probe.sparkSession
    val boundDt = build.schema(loCol).dataType
    if (forceBinned || (BinnedRangeFallback.overCeiling(build) &&
        BinnedRangeFallback.supportedBoundType(boundDt)))
      return BinnedRangeFallback.overlapJoin(probe, build, probeLoCol,
        probeHiCol, loCol, hiCol, prefix)
    Strategies.ensureRegistered(spark, OverlapJoinStrategy)
    val renamed = build.select(
      build.columns.toIndexedSeq.map(c => col(c).as(prefix + c)): _*)
    val lPlan = probe.queryExecution.analyzed
    val rPlan = renamed.queryExecution.analyzed
    def resolve(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name)}"))
    Shim.ofRows(spark, OverlapJoinPlan(
      resolve(lPlan, probeLoCol),
      resolve(lPlan, probeHiCol),
      resolve(rPlan, prefix + loCol),
      resolve(rPlan, prefix + hiCol),
      lPlan, rPlan))
  }
}
