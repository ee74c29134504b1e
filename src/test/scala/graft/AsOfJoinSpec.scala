package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom sort-merge AsOfJoinExec (plans/AsOfJoin.scala): equality with
  * the window formulation, plan shape (co-partitioned merge, no Window),
  * null-key/null-ord SQL semantics, and tie handling. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def viaCustom() = {
    val ev = Tables.load(spark, sf, "events")
    plans.AsOfJoin.asofJoin(
      ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("ts"), col("user_id")),
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id")),
      keys = Seq("user_id"), ordCols = Seq("ts", "event_id"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("r_ts").as("last_purchase_ts"))
  }

  test("custom exec equals the window last(ignoreNulls) formulation") {
    val custom = viaCustom().orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), r.get(1), r.getLong(2), r.get(3)))
    val window = operators.EventsPipeline
      .asofLastPurchase(Tables.load(spark, sf, "events"))
      .collect().map(r => (r.getLong(0), r.get(1), r.getLong(2), r.get(3)))
    assert(custom.length == window.length && custom.length > 0)
    assert(custom.toSeq == window.toSeq)
  }

  test("plan is AsOfJoinExec fed by sorts, no Window operator") {
    val plan = viaCustom().queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
  }

  test("full right payload flows through and ties break by tiebreaker") {
    import spark.implicits._
    // key a: left event 9 at ts=10 sees right events 7 (ts 4) and 8
    // (ts 10, tie on ts, 8 <= 9) — as-of picks the LAST in
    // (ts, event_id) order: event 8, payload intact. key b: no right
    // row -> nulls. right key c: never consumed.
    val left = Seq((1L, 5L, "a"), (9L, 10L, "a"), (4L, 2L, "b"))
      .toDF("event_id", "ts", "user_id")
    val right = Seq(("a", 4L, 7L, "x"), ("a", 10L, 8L, "y"), ("c", 1L, 9L, "z"))
      .toDF("user_id", "ts", "event_id", "payload")
    val out = plans.AsOfJoin
      .asofJoin(left, right, Seq("user_id"), Seq("ts", "event_id"))
      .select(col("event_id"), col("r_event_id"), col("r_payload"))
      .orderBy(col("event_id")).collect()
    assert(out.toSeq == Seq(
      Row(1L, 7L, "x"), Row(4L, null, null), Row(9L, 8L, "y")))
  }

  test("null keys and null ord columns never match (SQL UNKNOWN)") {
    import spark.implicits._
    val left = Seq((1L, java.lang.Long.valueOf(5L), "a"),
      (2L, null.asInstanceOf[java.lang.Long], "a"),
      (3L, java.lang.Long.valueOf(5L), null.asInstanceOf[String]))
      .toDF("event_id", "ts", "user_id")
    val right = Seq(("a", 1L, 7L), (null.asInstanceOf[String], 1L, 8L))
      .toDF("user_id", "ts", "event_id")
    val out = plans.AsOfJoin
      .asofJoin(left, right, Seq("user_id"), Seq("ts"))
      .select(col("event_id"), col("r_event_id"))
      .orderBy(col("event_id")).collect()
    assert(out.toSeq == Seq(Row(1L, 7L), Row(2L, null), Row(3L, null)))
  }

  test("forward direction picks the FIRST right row at or after, " +
      "reusable across left rows, ties inclusive") {
    import spark.implicits._
    // key a: left ts=3 -> right ts=4 (first at-or-after); left ts=4
    // with id 8 -> the SAME right row (ts=4, id >= 8 tie-inclusive);
    // left ts=11 -> no later right row -> nulls. key b: no right rows.
    val left = Seq((1L, 3L, "a"), (8L, 4L, "a"), (2L, 11L, "a"),
      (3L, 1L, "b"))
      .toDF("event_id", "ts", "user_id")
    val right = Seq(("a", 1L, 5L, "w"), ("a", 4L, 9L, "x"),
      ("a", 10L, 6L, "y"), ("c", 1L, 7L, "z"))
      .toDF("user_id", "ts", "event_id", "payload")
    val out = plans.AsOfJoin
      .asofJoin(left, right, Seq("user_id"), Seq("ts", "event_id"),
        direction = "forward")
      .select(col("event_id"), col("r_event_id"), col("r_payload"))
      .orderBy(col("event_id")).collect()
    assert(out.toSeq == Seq(
      Row(1L, 9L, "x"), Row(2L, null, null), Row(3L, null, null),
      Row(8L, 9L, "x")))
  }

  test("forward direction equals the window first(ignoreNulls) " +
      "formulation on the fixture") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, sf, "events")
    val custom = plans.AsOfJoin.asofJoin(
      ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("ts"), col("user_id")),
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id")),
      keys = Seq("user_id"), ordCols = Seq("ts", "event_id"),
      direction = "forward")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("r_ts").as("next_purchase_ts"))
      .orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), r.get(1), r.getLong(2), r.get(3)))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val window = ev
      .withColumn("purchase_ts",
        when(col("event_type") === "purchase", col("ts")))
      .withColumn("next_purchase_ts",
        first(col("purchase_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "view")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("next_purchase_ts"))
      .orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), r.get(1), r.getLong(2), r.get(3)))
    assert(custom.length == window.length && custom.length > 0)
    assert(custom.toSeq == window.toSeq)
    assert(custom.exists(_._4 != null))
  }

  test("nearest composition: the second as-of consumes the first's " +
      "clustering AND ordering — three exchanges, three sorts total") {
    val ev = Tables.load(spark, sf, "events")
    val plan = operators.EventsPipeline.asofNearestPurchase(ev)
      .queryExecution.executedPlan.toString
    // views + purchases for join 1, purchases again for join 2; the
    // second join's LEFT side re-exchanges nothing because AsOfJoinExec
    // forwards outputPartitioning/outputOrdering (without the forward,
    // this plan held a 4th user_id exchange + a 4th sort)
    val hashX = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "\\+- Sort ".r.findAllIn(plan).length
    assert(hashX == 3, s"expected 3 hash exchanges, got $hashX:\n" +
      plan.take(1500))
    assert(sorts == 3, s"expected 3 sorts, got $sorts")
  }

  test("nearest composition picks the smaller |delta| with ties to the " +
      "backward side") {
    import spark.implicits._
    // user u: views at ts 100 (purchases at 90/105 -> forward wins,
    // delta 5 vs 10), ts 200 (purchases at 195/205 -> TIE, backward
    // wins), ts 300 (only earlier purchases -> backward), user v: no
    // purchases -> null
    val now = 1700000000L // seconds; timestamps built below in micros
    def t(s: Long) = new java.sql.Timestamp((now + s) * 1000L)
    val events = Seq(
      (1L, t(100), 10L, "view"), (2L, t(200), 10L, "view"),
      (3L, t(300), 10L, "view"), (4L, t(50), 20L, "view"),
      (11L, t(90), 10L, "purchase"), (12L, t(105), 10L, "purchase"),
      (13L, t(195), 10L, "purchase"), (14L, t(205), 10L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = operators.EventsPipeline.asofNearestPurchase(events)
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(3))))
    assert(out.toSeq == Seq(
      (1L, Some(t(105))), (2L, Some(t(195))), (3L, Some(t(205))),
      (4L, None)))
  }

  test("null in a NON-leading ord column matches nothing, even after a " +
      "held match for the same key") {
    import spark.implicits._
    // Sorted left order for key a: (ts=5, id=null) sorts FIRST
    // (nulls-first), then (ts=5, id=1), then (ts=9, id=null) — the last
    // one arrives while a right row is already held for the key and must
    // STILL produce nulls (lexicographic comparison with null = UNKNOWN).
    val left = Seq(
      (1L, java.lang.Long.valueOf(5L), java.lang.Long.valueOf(1L), "a"),
      (2L, java.lang.Long.valueOf(5L), null.asInstanceOf[java.lang.Long], "a"),
      (3L, java.lang.Long.valueOf(9L), null.asInstanceOf[java.lang.Long], "a"))
      .toDF("event_id", "ts", "seq", "user_id")
    val right = Seq(("a", 4L, 7L, 70L))
      .toDF("user_id", "ts", "seq", "payload")
    val out = plans.AsOfJoin
      .asofJoin(left, right, Seq("user_id"), Seq("ts", "seq"))
      .select(col("event_id"), col("r_payload"))
      .orderBy(col("event_id")).collect()
    assert(out.toSeq == Seq(Row(1L, 70L), Row(2L, null), Row(3L, null)))
  }
}
