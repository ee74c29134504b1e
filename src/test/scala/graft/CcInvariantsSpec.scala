package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Self-test of the CC-fixpoint invariant gate (VERDICT r11 item 4):
  * the clean operator outputs pass every invariant, and a SEEDED
  * violation of each class fires exactly the counter built for it —
  * so a 256× "all PASS" from `ScaledGate k INVARIANTS` certifies the
  * fixpoint family, not a vacuous checker. */
class CcInvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs = Tables.load(spark, TestSpark.sf, "documents")
  private lazy val pairs = dedup.Dedup
    .jaccardPairs(docs, threshold = 0.5)
    .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
  private lazy val clusters = operators.Pipeline
    .dedupClusters(docs).localCheckpoint(true)
  private lazy val weights = operators.Pipeline
    .dedupWeights(docs).localCheckpoint(true)
  private lazy val splits = operators.Pipeline
    .leakageSafeSplits(docs).localCheckpoint(true)

  private def counts(cs: Seq[(String, Long)]): Map[String, Long] = cs.toMap

  test("clean fixpoint-family outputs pass every invariant (and the " +
      "fixture actually exercises multi-member clusters)") {
    assert(pairs.count() > 0, "fixture has no near-dup pairs — vacuous")
    val res = CcInvariants.checkLabeled(docs, pairs, clusters, weights,
      splits)
    assert(res.size == 12)
    res.foreach { case (n, v) => assert(v == 0L, s"$n: $v violations") }
  }

  test("a swapped cluster label fires the pair/min/fixpoint counters") {
    // move ONE clustered (non-canonical) doc to a fresh label
    val victim = clusters.filter(!col("is_canonical"))
      .select(col("doc_id")).head().getLong(0)
    val corrupted = clusters.withColumn("cluster_id",
      when(col("doc_id") === victim, lit(999999999L))
        .otherwise(col("cluster_id")))
    val c = counts(CcInvariants.checkLabeled(docs, pairs, corrupted,
      weights, splits))
    assert(c("pair_edge_crosses_clusters") > 0)
    assert(c("member_label_above_own_id") > 0)
    assert(c("extra_propagation_round_changes_labels") > 0)
  }

  test("an early-terminated fixpoint (labels = one round only) fails " +
      "the extra-round certificate") {
    // the fixture's clusters are shallow enough that one round already
    // converges (the clean run proves it), so seed a diameter-3 CHAIN
    // where one min-label round provably is NOT the fixed point:
    // 1-2-3-4 -> one-round labels (1,1,2,3)
    val sq = spark; import sq.implicits._
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val edges = chain.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(chain.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val oneRound = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("cluster_id"))
      .select(col("src").as("doc_id"), col("cluster_id"),
        (col("src") === col("cluster_id")).as("is_canonical"))
    val chainDocs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val c = counts(CcInvariants.checkLabeled(chainDocs, chain, oneRound,
      weights, splits))
    assert(c("pair_edge_crosses_clusters") > 0)
    assert(c("extra_propagation_round_changes_labels") > 0)
    assert(c("cluster_label_not_min_member") > 0)
  }

  test("a dropped vertex fires the coverage counter") {
    val victim = clusters.select(col("doc_id")).head().getLong(0)
    val dropped = clusters.filter(col("doc_id") =!= victim)
    val c = counts(CcInvariants.checkLabeled(docs, pairs, dropped,
      weights, splits))
    assert(c("vertex_coverage_mismatch") > 0)
  }

  test("a stale weight and a wrong cluster size fire the weight " +
      "counters; a re-bucketed split fires the gate counter") {
    val badWeight = weights.withColumn("weight",
      when(col("cluster_size") > 1, lit(1.0)).otherwise(col("weight")))
    val cw = counts(CcInvariants.checkLabeled(docs, pairs, clusters,
      badWeight, splits))
    assert(cw("weights_value_wrong") > 0)
    val badSize = weights.withColumn("cluster_size",
      col("cluster_size") + 1)
    val cs = counts(CcInvariants.checkLabeled(docs, pairs, clusters,
      badSize, splits))
    assert(cs("weights_cluster_size_wrong") > 0)
    val badSplit = splits.withColumn("split", lit("train"))
    val cp = counts(CcInvariants.checkLabeled(docs, pairs, clusters,
      weights, badSplit))
    assert(cp("splits_gate_mismatch") > 0)
  }

  test("CC label cache: disk-cached labels are bit-identical to the " +
      "uncached computation across the whole family, warm and cold") {
    val key = Some(s"cc-spec:${TestSpark.sf}/documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // first keyed call builds the parquet artifact; all four consumers
    // must match their uncached twins exactly
    assert(rows(operators.Pipeline.dedupClusters(docs, cacheKey = key))
      == rows(clusters))
    assert(rows(operators.Pipeline.dedupWeights(docs, cacheKey = key))
      == rows(weights))
    assert(rows(operators.Pipeline.leakageSafeSplits(docs, cacheKey = key))
      == rows(splits))
    assert(rows(operators.Pipeline.clusterCanonical(docs, cacheKey = key))
      == rows(operators.Pipeline.clusterCanonical(docs)))
    // fully-warm repeat stays identical
    assert(rows(operators.Pipeline.dedupClusters(docs, cacheKey = key))
      == rows(clusters))
  }

  test("CC label cache: concurrent first calls race safely (at worst " +
      "a double build of identical content; results identical)") {
    // two threads may both miss the TrieMap and build — SessionDirs'
    // getOrElseUpdate keeps ONE path cached; a double build writes the
    // same deterministic parquet to two temp roots, one of which wins.
    // The contract is result identity, not single execution.
    val key = Some(s"cc-race:${TestSpark.sf}/documents")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 4).map(_ => Future {
      operators.Pipeline.dedupClusters(docs, cacheKey = key)
        .collect().map(_.toString).sorted.toSeq
    })
    val results = Await.result(Future.sequence(fs), 300.seconds)
    val expected = clusters.collect().map(_.toString).sorted.toSeq
    results.foreach(r => assert(r == expected))
  }

  test("a split that ignores clusters fires the straddle counter") {
    // hash the DOC id instead of the cluster id — the classic leaky
    // split the operator exists to prevent
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 1)
    val leaky = splits.withColumn("split",
      when(bucket.isin("0", "1", "2", "3", "4", "5", "6", "7",
        "8", "9", "a", "b"), "train")
        .when(bucket.isin("c", "d"), "val").otherwise("test"))
    val c = counts(CcInvariants.checkLabeled(docs, pairs, clusters,
      weights, leaky))
    assert(c("splits_pair_straddles_splits") +
      c("splits_gate_mismatch") > 0)
  }
}
