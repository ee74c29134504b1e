package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-catalog plan audit: no query may plan a CartesianProduct — the
  * one operator shape that cannot survive a 100-TB input — except the
  * explicitly-intentional demonstrations. (BroadcastNestedLoopJoin is
  * permitted ONLY because every non-intentional occurrence here is a
  * one-row scalar-anchor broadcast; the quadratic theta-join baseline
  * that uses it for real is itself the documented contrast query for
  * its pair-free rewrite.) */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // intentional: q_cross_join demonstrates the tiny-dimension cross join
  private val cartesianAllowed = Set("q_cross_join")

  test("no query plans a CartesianProduct (except the intentional demo)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // building the frame may run small driver-side jobs (scalar
        // anchors, streaming drains, CC rounds) — at sf0.001 that is
        // cheap, and it is exactly what the driver's Verify does
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") &&
          !cartesianAllowed.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct found in: ${offenders.mkString(", ")}")
  }
}
