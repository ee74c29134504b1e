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
