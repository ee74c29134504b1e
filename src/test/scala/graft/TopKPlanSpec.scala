package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom TopKPerGroup physical operator (LogicalPlan + Strategy +
  * SparkPlan): equality with the window formulation, plan shape, and
  * behavior on edge groups. */
class TopKPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def viaCustom(k: Int) = plans.TopKPerGroup.topKPerGroup(
    Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
    Seq("o_custkey"),
    Seq("o_totalprice" -> true, "o_orderkey" -> false),
    k)

  test("custom operator equals the window row_number formulation") {
    val custom = viaCustom(3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val window = operators.Relational.top3OrdersPerCustomer(
      Tables.load(spark, sf, "orders"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(custom.toSeq == window.toSeq)
  }

  test("plan contains TopKPerGroupExec and no Window/full Sort before it") {
    val plan = viaCustom(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(500))
    assert(!plan.contains("Window"), plan.take(800))
  }

  test("groups smaller than k return all their rows") {
    val out = viaCustom(1000000).count()
    assert(out == Tables.load(spark, sf, "orders").count())
  }
}
