package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom broadcast range-join operator (plans/BroadcastRangeJoin):
  * semantics pinned against the BroadcastNestedLoopJoin form Spark
  * would otherwise plan, plus the operator-specific edges (boundary
  * inclusivity, multi-match, nulls, empty build) and the plan shape. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def intervals(rows: Seq[(Long, Long, Long)]) = {
    val sq = spark; import sq.implicits._
    rows.toDF("band_id", "lo", "hi")
  }
  private def probes(xs: Seq[java.lang.Long]) = {
    val sq = spark; import sq.implicits._
    xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
  }

  test("matches the BroadcastNestedLoopJoin form on real event data") {
    val events = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("x"))
    val anchor = events.agg(max(col("x")).as("anchor"))
    val h12 = 12L * 3600L * 1000000L
    val bands = spark.range(8).crossJoin(broadcast(anchor))
      .select((lit(1200) + col("id")).as("band_id"),
        (col("anchor") - (col("id") + 1) * lit(h12) + 1).as("lo"),
        (col("anchor") - col("id") * lit(h12)).as("hi"))
    val custom = plans.RangeJoin
      .broadcastRangeJoin(events, bands, "x", "lo", "hi")
      .select(col("event_id"), col("r_band_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val bnlj = events.join(broadcast(bands),
        col("x") >= col("lo") && col("x") <= col("hi"))
      .select(col("event_id"), col("band_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(custom.nonEmpty && custom.toSeq == bnlj.toSeq)
  }

  test("boundary inclusivity, multi-match, and miss cases") {
    val build = intervals(Seq((1L, 10L, 20L), (2L, 15L, 30L), (3L, 40L, 40L)))
    val out = plans.RangeJoin
      .broadcastRangeJoin(probes(Seq(10L, 20L, 17L, 35L, 40L, 41L)),
        build, "x", "lo", "hi")
      .select(col("x"), col("r_band_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq(
      (10L, 1L),            // x == lo inclusive
      (17L, 1L), (17L, 2L), // overlap region: BOTH intervals match
      (20L, 1L), (20L, 2L), // x == hi inclusive (and inside band 2)
      (40L, 3L)))           // degenerate [40,40] point interval
    // 35 falls in the gap, 41 beyond all his: dropped (inner join)
  }

  test("null probe values and null bounds match nothing") {
    val sq = spark; import sq.implicits._
    val build = Seq((1L, Some(10L), Some(20L)), (2L, None, Some(30L)),
      (3L, Some(5L), None)).toDF("band_id", "lo", "hi")
    val out = plans.RangeJoin
      .broadcastRangeJoin(probes(Seq(15L, null)), build, "x", "lo", "hi")
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("r_band_id") == 1L)
  }

  test("empty build side yields an empty inner join") {
    val out = plans.RangeJoin
      .broadcastRangeJoin(probes(Seq(1L, 2L)),
        intervals(Seq.empty), "x", "lo", "hi")
    assert(out.count() == 0)
  }

  test("plan shape: custom exec + broadcast exchange, no BNLJ") {
    val plan = plans.RangeJoin
      .broadcastRangeJoin(probes(Seq(1L)),
        intervals(Seq((1L, 0L, 5L))), "x", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), plan.take(800))
    assert(plan.contains("BroadcastExchange"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  // ---- keyed variant (plans/KeyedRangeJoin): key equality + range ----

  private def keyedIntervals(rows: Seq[(String, Long, Long, Long)]) = {
    val sq = spark; import sq.implicits._
    rows.toDF("k", "band_id", "lo", "hi")
  }
  private def keyedProbes(xs: Seq[(String, java.lang.Long)]) = {
    val sq = spark; import sq.implicits._
    xs.zipWithIndex.map { case ((k, x), i) => (i.toLong, k, x) }
      .toDF("pid", "pk", "x")
  }

  test("keyed: matches the native equi-join + BETWEEN filter on real " +
      "event data with per-key grids") {
    val events = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("x"))
    val out = operators.EventsPipeline
      .keyedRangeBandCounts(Tables.load(spark, TestSpark.sf, "events"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // native form: plain equi+filter join over the same construction
    val sq = spark; import sq.implicits._
    val h6 = 6L * 3600L * 1000000L
    val anchor = events.agg(max(col("x")).as("anchor"))
    val types = Seq("click", "error", "purchase", "signup", "view")
    val bands = types.zipWithIndex.toDF("etype", "ti")
      .crossJoin(spark.range(6)).crossJoin(broadcast(anchor))
      .select(col("etype"),
        (lit(100) * (col("ti") + 1) + col("id")).as("band_id"),
        (col("anchor") - (col("id") + 1) * (lit(h6) * (col("ti") + 1)) + 1)
          .as("lo"),
        (col("anchor") - col("id") * (lit(h6) * (col("ti") + 1))).as("hi"))
    val native = events.join(broadcast(bands),
        col("event_type") === col("etype") &&
          col("x").between(col("lo"), col("hi")))
      .groupBy(col("event_type"), col("band_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(out.nonEmpty && out.sorted == native)
  }

  test("keyed: key equality gates range matches; null keys and null " +
      "probe values match nothing") {
    val sq = spark; import sq.implicits._
    val build = Seq(
      ("a", 1L, Some(10L), Some(20L)),
      ("b", 2L, Some(10L), Some(20L)),
      (null.asInstanceOf[String], 3L, Some(0L), Some(100L)))
      .toDF("k", "band_id", "lo", "hi")
    val out = plans.KeyedRangeJoin
      .broadcastKeyedRangeJoin(
        keyedProbes(Seq(("a", 15L), ("b", 15L), ("c", 15L), ("a", 25L),
          (null, 15L), ("a", null))),
        build, "pk", "x", "k", "lo", "hi")
      .select(col("pk"), col("x"), col("r_band_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    // "a"@15 -> band 1 only (not b's identical interval); "c" has no
    // group; "a"@25 out of range; null key / null x drop; the
    // null-key build row matches NOTHING even though its range spans
    // every probe
    assert(out == Seq(("a", 15L, 1L), ("b", 15L, 2L)))
  }

  test("keyed: boundary inclusivity and overlapping intervals within " +
      "one key group") {
    val build = keyedIntervals(Seq(
      ("a", 1L, 10L, 20L), ("a", 2L, 15L, 30L), ("a", 3L, 40L, 40L),
      ("b", 9L, 0L, 100L)))
    val out = plans.KeyedRangeJoin
      .broadcastKeyedRangeJoin(
        keyedProbes(Seq(("a", 10L), ("a", 17L), ("a", 20L), ("a", 40L),
          ("a", 35L))),
        build, "pk", "x", "k", "lo", "hi")
      .select(col("x"), col("r_band_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq((10L, 1L), (17L, 1L), (17L, 2L), (20L, 1L),
      (20L, 2L), (40L, 3L)))
  }

  test("keyed: empty build and plan shape") {
    val empty = plans.KeyedRangeJoin.broadcastKeyedRangeJoin(
      keyedProbes(Seq(("a", 1L))), keyedIntervals(Seq.empty),
      "pk", "x", "k", "lo", "hi")
    assert(empty.count() == 0)
    val plan = plans.KeyedRangeJoin.broadcastKeyedRangeJoin(
      keyedProbes(Seq(("a", 1L))),
      keyedIntervals(Seq(("a", 1L, 0L, 5L))), "pk", "x", "k", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("KeyedBroadcastRangeJoin"), plan.take(800))
    assert(plan.contains("BroadcastExchange"), plan.take(800))
    assert(!plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }
}
