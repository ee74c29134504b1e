package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.Shim

/** Custom whole-operator #4: KEYED broadcast range join —
  * `probe.k = build.k AND probe.x BETWEEN build.lo AND build.hi`
  * against a small keyed-interval dimension. This is the SCD2 /
  * temporal-dimension lookup shape (business key equality + effective
  * date range) and the per-category band shape (each key carries its
  * OWN interval grid), generalizing [[BroadcastRangeJoinExec]] the way
  * that operator generalized the banded rewrites.
  *
  * Why not built-ins: with an equi key available, Spark plans this as
  * BroadcastHashJoin on the key with the range predicate as a
  * POST-JOIN filter — every probe row first materializes ALL G
  * intervals of its key group, then filters: O(G) per row. This exec
  * hash-partitions the build side by key ONCE on the driver, inside
  * the BroadcastExchange (each group lo-sorted with a running-max-hi;
  * the KeyedRangeIndexBroadcastMode in RangeIndexSupport), then probes
  * in O(1) map lookup + O(log G + matches):
  *
  *  - the probe key is canonicalized through an UnsafeProjection of
  *    the single key column, so lookup is byte-equality on UnsafeRows
  *    (the BytesToBytesMap precedent in Spark's own hash joins) —
  *    probe and build key expressions must share a dataType;
  *  - INNER semantics: null keys, null probe values, and null bounds
  *    match nothing (SQL UNKNOWN); unmatched probe rows drop;
  *  - the streamed side's partitioning/ordering forward (probe rows
  *    pass through in place and in order, the BroadcastHashJoinExec
  *    shape).
  *
  * Exactness: output is row-identical (as a multiset) to the native
  * equi-join + BETWEEN filter, so one DuckDB oracle checks both;
  * RangeJoinSpec pins the equivalence, boundary, null-key and
  * empty-group cases. SCALING.md A/Bs it against the BHJ+filter plan
  * at growing per-key interval counts. */
case class KeyedRangeJoinPlan(probeKey: Expression, probeExpr: Expression,
    buildKey: Expression, loExpr: Expression, hiExpr: Expression,
    left: LogicalPlan, right: LogicalPlan,
    leftOuter: Boolean = false) extends BinaryNode {
  require(probeKey.dataType == buildKey.dataType,
    "keyed range join key types must match")
  // the keyed lookup is UnsafeRow BYTE equality, under which -0.0 and
  // 0.0 (and distinct NaN payloads) differ while the native equi-join
  // normalizes them — reject floating-point keys outright (see the
  // RangeIndexSupport scaladoc for the full FP caveat)
  require(probeKey.dataType != org.apache.spark.sql.types.FloatType &&
    probeKey.dataType != org.apache.spark.sql.types.DoubleType,
    s"keyed range join keys must not be floating-point, got " +
      s"${probeKey.dataType} (byte-equality lookup cannot normalize " +
      "-0.0/NaN the way the native equi-join does)")
  require(probeExpr.dataType == loExpr.dataType &&
    probeExpr.dataType == hiExpr.dataType,
    "keyed range join probe/lo/hi types must match")
  // LEFT OUTER keeps every probe row; unmatched rows carry nulls on the
  // build side, so its attributes must advertise nullability
  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan,
      r: LogicalPlan): KeyedRangeJoinPlan = copy(left = l, right = r)
}

case class KeyedBroadcastRangeJoinExec(probeKey: Expression,
    probeExpr: Expression, buildKey: Expression, loExpr: Expression,
    hiExpr: Expression, left: SparkPlan, right: SparkPlan,
    leftOuter: Boolean = false)
    extends BinaryExecNode {
  import RangeIndexSupport.RangeIndex

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  /** Build side broadcast as the DRIVER-BUILT key → lo-sorted-group
    * map (the HashedRelationBroadcastMode precedent — see
    * RangeIndexSupport). */
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(RangeIndexSupport.KeyedRangeIndexBroadcastMode(
        buildKey, loExpr, hiExpr, right.output)) :: Nil

  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = left.output
    val rSchema = right.output
    val pKeyE = probeKey; val pExpr = probeExpr
    val outerFlag = leftOuter
    val outAttrs = output
    val bc = right.executeBroadcast[
      org.apache.spark.sql.execution.graftshim.DriverBuiltRelation]()
    left.execute().mapPartitions { lIter =>
      val cmp = RangeIndexSupport.ordering(pExpr.dataType)
      val probeProj = UnsafeProjection.create(pExpr :: Nil, lSchema)
      val probeKeyProj = UnsafeProjection.create(pKeyE :: Nil, lSchema)
      val index = bc.value.payload
        .asInstanceOf[java.util.HashMap[UnsafeRow, RangeIndex]]
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      // one shared all-null build-side row pads LEFT OUTER misses (the
      // BroadcastHashJoinExec nullRow pattern); JoinedRow copies out
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          rSchema.length)
      lIter.flatMap { lRow =>
        val k = probeKeyProj(lRow)
        val x = probeProj(lRow)
        val g = if (k.isNullAt(0) || x.isNullAt(0)) null else index.get(k)
        if (!outerFlag) {
          if (g == null) Iterator.empty
          else RangeIndexSupport.probe(g, cmp, x, lRow.copy(), joined,
            outProj)
        } else {
          // LEFT OUTER: a null key / null probe value / absent group /
          // empty walk each yield exactly one null-padded row
          val lCopy = lRow.copy()
          val it = if (g == null) Iterator.empty
            else RangeIndexSupport.probe(g, cmp, x, lCopy, joined, outProj)
          if (it.hasNext) it
          else Iterator.single(outProj(joined(lCopy, nullRight)).copy())
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan,
      r: SparkPlan): KeyedBroadcastRangeJoinExec = copy(left = l, right = r)
}

object KeyedRangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KeyedRangeJoinPlan(pk, p, bk, lo, hi, l, r, outer) =>
      KeyedBroadcastRangeJoinExec(pk, p, bk, lo, hi,
        planLater(l), planLater(r), outer) :: Nil
    case _ => Nil
  }
}

object KeyedRangeJoin {
  /** Inner keyed broadcast range join: every (probe row, build row)
    * pair with `probe.probeKeyCol = build.keyCol AND probe.probeCol
    * BETWEEN build.loCol AND build.hiCol` (bounds inclusive; null keys
    * and null bounds match nothing). Build-side columns are re-aliased
    * with `prefix` (fresh exprIds — the asofJoin contract). The build
    * side degrades to the binned shuffle plan past the
    * `spark.graft.rangeJoin.maxBuildBytes` size estimate
    * ([[BinnedRangeFallback]]).
    *
    * `leftOuter = true` keeps every probe row — unmatched rows (no key
    * group, out-of-range value, null key or null probe value) emit
    * exactly ONE row with the build side null-padded: the SCD2
    * dimension-lookup contract, where a fact outside every version's
    * validity window must survive with an unknown version rather than
    * silently drop. */
  def broadcastKeyedRangeJoin(probe: DataFrame, build: DataFrame,
      probeKeyCol: String, probeCol: String, keyCol: String,
      loCol: String, hiCol: String, prefix: String = "r_",
      leftOuter: Boolean = false, forceBinned: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = probe.sparkSession
    // FP keys are rejected ON BOTH SIDES ahead of the size branch so
    // both plans hold the same contract (the exec's byte-equality
    // lookup cannot normalize -0.0/NaN; the fallback's native
    // equi-join WOULD, and a ceiling change must never flip match
    // semantics). Checking only the probe side let a float/double
    // BUILD key slip past via implicit cast (ADVICE r12).
    for ((side, dt) <- Seq(
        "probe" -> probe.schema(probeKeyCol).dataType,
        "build" -> build.schema(keyCol).dataType))
      require(dt != org.apache.spark.sql.types.FloatType &&
        dt != org.apache.spark.sql.types.DoubleType,
        s"keyed range join keys must not be floating-point, got $dt " +
          s"on the $side side (byte-equality lookup cannot normalize " +
          "-0.0/NaN the way the native equi-join does)")
    val boundDt = build.schema(loCol).dataType
    if (forceBinned || (BinnedRangeFallback.overCeiling(build) &&
        BinnedRangeFallback.supportedBoundType(boundDt)))
      return BinnedRangeFallback.keyedRangeJoin(probe, build,
        probeKeyCol, probeCol, keyCol, loCol, hiCol, prefix, leftOuter)
    Strategies.ensureRegistered(spark, KeyedRangeJoinStrategy)
    val renamed = build.select(
      build.columns.toIndexedSeq.map(c => col(c).as(prefix + c)): _*)
    val lPlan = probe.queryExecution.analyzed
    val rPlan = renamed.queryExecution.analyzed
    def resolve(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name)}"))
    Shim.ofRows(spark, KeyedRangeJoinPlan(
      resolve(lPlan, probeKeyCol),
      resolve(lPlan, probeCol),
      resolve(rPlan, prefix + keyCol),
      resolve(rPlan, prefix + loCol),
      resolve(rPlan, prefix + hiCol),
      lPlan, rPlan, leftOuter))
  }
}
