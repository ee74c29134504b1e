package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graph-family invariant gate is not vacuous: every counter fires
  * on a seeded violation of its class (the CcInvariantsSpec recipe).
  * The clean base-fixture run must be all-zero — that is the same
  * configuration the 64× DuckDB oracle already certifies, so a
  * disagreement here would mean the CHECKER is wrong. */
class GraphInvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val li = Tables.load(spark, TestSpark.sf, "lineitem")

  private def counts(pr: DataFrame, bfs: DataFrame, lpa: DataFrame)
      : Map[String, Long] =
    GraphInvariants.checkOutputs(li, partCap = 2000, seedCap = 3,
      seedModulo = 0, iters = 3, pr, bfs, lpa).toMap

  private lazy val pr = operators.Graph.pagerank(li).localCheckpoint(true)
  private lazy val bfs = operators.Graph.bfsHops(li).localCheckpoint(true)
  private lazy val lpa = operators.Graph.labelPropagation(li)

  test("clean engine outputs pass every invariant") {
    val c = counts(pr, bfs, lpa)
    assert(c.values.forall(_ == 0L), s"clean run not all-zero: $c")
    // and the inputs are non-trivial (an empty graph certifies nothing)
    assert(pr.count() > 0 && bfs.count() > 0 && lpa.count() > 0)
  }

  test("a corrupted rank fires the pagerank dual-computation counter") {
    val bad = pr.withColumn("rank",
      when(col("node") === pr.orderBy(col("rank").desc, col("node"))
        .head().getString(0), col("rank") + 1).otherwise(col("rank")))
    assert(counts(bad, bfs, lpa)("pr_top100_mismatch") > 0)
  }

  test("a rank below the damping floor fires the floor counter") {
    val bad = pr.limit(1).withColumn("rank", lit(149999L))
      .unionAll(pr.exceptAll(pr.limit(1)))
    assert(counts(bad, bfs, lpa)("pr_rank_below_floor") > 0)
  }

  test("a malformed BFS label fires the parse-failure counter instead " +
      "of aliasing to a fabricated packed id") {
    val victim = bfs.head().getString(0)
    val bad = bfs.withColumn("node",
      when(col("node") === victim, concat(lit("x"), col("node")))
        .otherwise(col("node")))
    assert(counts(pr, bad, lpa)("bfs_label_unparseable") > 0)
  }

  test("a duplicated BFS row fires the one-row-per-node counter") {
    val bad = bfs.unionAll(bfs.limit(1))
    assert(counts(pr, bad, lpa)("bfs_duplicate_node") > 0)
  }

  test("an out-of-range depth fires the depth counter") {
    val bad = bfs.withColumn("d",
      when(col("d") === 2, lit(99L)).otherwise(col("d")))
    assert(counts(pr, bad, lpa)("bfs_depth_out_of_range") > 0)
  }

  test("a dropped seed fires the seed-set counter") {
    val bad = bfs.filter(!(col("d") === 0 &&
      col("node") === bfs.filter(col("d") === 0).head().getString(0)))
    assert(counts(pr, bad, lpa)("bfs_seed_set_wrong") > 0)
  }

  test("an off-by-two hop fires the edge-gap counter (and usually the " +
      "witness counter too)") {
    // push every d=1 node to d=3: its edge to a seed (d=0) now gaps by 3
    val bad = bfs.withColumn("d",
      when(col("d") === 1, lit(3L)).otherwise(col("d")))
    val c = counts(pr, bad, lpa)
    assert(c("bfs_edge_gap_gt1") > 0)
  }

  test("an orphaned depth (no neighbor one hop closer) fires the " +
      "parent-witness counter") {
    // drop all d=1 rows: d=2 nodes keep valid gaps to d=3 neighbors
    // but lose every parent at d=1
    val bad = bfs.filter(col("d") =!= 1)
    assert(counts(pr, bad, lpa)("bfs_parent_witness_missing") > 0)
  }

  test("a truncated reached set fires the completeness counter") {
    // drop the deepest REACHED layer (the fixture ball may saturate
    // before iters hops): its parent-witnessed nodes one hop shallower
    // now have unreached neighbors that SHOULD be within the ball
    val maxD = bfs.agg(max(col("d"))).head().getLong(0)
    assert(maxD >= 1, "fixture BFS ball is trivial; nothing to truncate")
    val bad = bfs.filter(col("d") =!= maxD)
    assert(counts(pr, bad, lpa)("bfs_reach_incomplete") > 0)
  }

  test("a relabeled community fires the LPA dual-computation counter") {
    val bad = lpa.withColumn("community",
      when(col("node") === lpa.head().getLong(0), lit(-1L))
        .otherwise(col("community")))
    val c = counts(pr, bfs, bad)
    assert(c("lpa_final_mismatch") > 0)
    // -1 is not a node id, so the membership counter fires too
    assert(c("lpa_label_not_member") > 0)
  }

  test("a dropped node fires the LPA coverage counter") {
    val bad = lpa.limit(0).unionAll(lpa.exceptAll(lpa.limit(1)))
    val c = counts(pr, bfs, bad)
    assert(c("lpa_coverage_mismatch") > 0)
  }
}
