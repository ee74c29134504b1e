package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable HLL sketches (Extended.approxUsersBySketch): the driver
  * check is rows-only (approximate by design), so the invariants that
  * make the operator trustworthy are pinned here:
  *  - per-group and global estimates within HLL error bounds of exact;
  *  - merge associativity: union of per-group sketches == one global
  *    sketch (the property that makes per-partition sketching + rollup
  *    valid at 100 TB). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("estimates are within 5% of exact counts, merge included") {
    val rows = operators.Extended
      .approxUsersBySketch(Tables.load(spark, sf, "events"))
      .collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("approx_count_distinct is within its rsd bound of exact") {
    val li = Tables.load(spark, sf, "lineitem")
    val approx = operators.Relational.approxDistinctParts(li)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, x) =>
      val a = approx(k).toDouble
      // rsd 0.01 requested; allow 5 sigma
      assert(math.abs(a - x) / x <= 0.05, s"$k approx=$a exact=$x")
    }
  }

  test("approx_percentile median sits within the exact quartile band") {
    val li = Tables.load(spark, sf, "lineitem")
    val approx = operators.Extended.approxPercentiles(li)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bands = operators.Extended.percentiles(li)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(3)))
    bands.foreach { case (k, q1, q3) =>
      val m = approx(k)
      assert(m >= q1 && m <= q3, s"$k approx median $m outside [$q1,$q3]")
    }
  }

  test("union of per-group sketches equals the single global sketch") {
    val ev = Tables.load(spark, sf, "events")
    val merged = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val direct = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect()(0).getLong(0)
    assert(merged == direct, s"merged=$merged direct=$direct")
  }
}
