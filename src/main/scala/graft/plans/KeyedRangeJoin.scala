package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
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
  * hash-partitions the broadcast build side by key ONCE per executor
  * (each group lo-sorted with a running-max-hi), then probes in
  * O(1) map lookup + O(log G + matches):
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
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
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
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan,
      r: LogicalPlan): KeyedRangeJoinPlan = copy(left = l, right = r)
}

case class KeyedBroadcastRangeJoinExec(probeKey: Expression,
    probeExpr: Expression, buildKey: Expression, loExpr: Expression,
    hiExpr: Expression, left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {
  import RangeIndexSupport.RangeIndex

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = left.output
    val rSchema = right.output
    val pKeyE = probeKey; val pExpr = probeExpr
    val bKeyE = buildKey; val loE = loExpr; val hiE = hiExpr
    val outAttrs = output
    val execId = this.id
    val bc = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      val vAttr = AttributeReference("v", pExpr.dataType,
        nullable = true)() :: Nil
      val cmp = GenerateOrdering.generate(
        vAttr.map(SortOrder(_, Ascending)), vAttr)
      val probeProj = UnsafeProjection.create(pExpr :: Nil, lSchema)
      val probeKeyProj = UnsafeProjection.create(pKeyE :: Nil, lSchema)
      // build-once per executor via the shared cache; the per-group
      // index build, probe walk, and cache design live in
      // RangeIndexSupport (one copy for both range-join execs)
      val index = RangeIndexSupport.getOrBuild[
          java.util.HashMap[UnsafeRow, RangeIndex]]((bc.id, execId)) {
        val keyProj = UnsafeProjection.create(bKeyE :: Nil, rSchema)
        val loProj = UnsafeProjection.create(loE :: Nil, rSchema)
        val hiProj = UnsafeProjection.create(hiE :: Nil, rSchema)
        val byKey = new java.util.HashMap[UnsafeRow,
          scala.collection.mutable.ArrayBuffer[
            (InternalRow, InternalRow, InternalRow)]]()
        bc.value.foreach { row =>
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
          }
        }
        val out = new java.util.HashMap[UnsafeRow, RangeIndex](
          byKey.size * 2)
        byKey.forEach { (k, buf) =>
          out.put(k, RangeIndexSupport.buildIndex(buf.toArray, cmp))
        }
        out
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      lIter.flatMap { lRow =>
        val k = probeKeyProj(lRow)
        val x = probeProj(lRow)
        val g = if (k.isNullAt(0) || x.isNullAt(0)) null else index.get(k)
        if (g == null) Iterator.empty
        else RangeIndexSupport.probe(g, cmp, x, lRow.copy(), joined,
          outProj)
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan,
      r: SparkPlan): KeyedBroadcastRangeJoinExec = copy(left = l, right = r)
}

object KeyedRangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KeyedRangeJoinPlan(pk, p, bk, lo, hi, l, r) =>
      KeyedBroadcastRangeJoinExec(pk, p, bk, lo, hi,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object KeyedRangeJoin {
  /** Inner keyed broadcast range join: every (probe row, build row)
    * pair with `probe.probeKeyCol = build.keyCol AND probe.probeCol
    * BETWEEN build.loCol AND build.hiCol` (bounds inclusive; null keys
    * and null bounds match nothing). Build-side columns are re-aliased
    * with `prefix` (fresh exprIds — the asofJoin contract). The build
    * side must be broadcast-sized. */
  def broadcastKeyedRangeJoin(probe: DataFrame, build: DataFrame,
      probeKeyCol: String, probeCol: String, keyCol: String,
      loCol: String, hiCol: String, prefix: String = "r_"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = probe.sparkSession
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
      lPlan, rPlan))
  }
}
