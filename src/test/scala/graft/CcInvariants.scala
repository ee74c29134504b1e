package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine invariant gate for the CC-fixpoint dedup family (VERDICT
  * r11 item 4): at 256× the DuckDB recursive-CTE oracle cannot follow
  * (>78 GB spill), so correctness there is certified by checking that
  * the ENGINE'S OWN output is a valid minimal fixed point of the pair
  * graph — properties a wrong answer cannot fake:
  *
  *  - no near-dup pair straddles two clusters (the one property
  *    leakage-safety and dedup survivorship actually rest on);
  *  - every cluster label is its cluster's minimum doc id, every
  *    member's label ≤ its own id, canonical flags consistent;
  *  - the labeling covers exactly the edge-connected vertex set;
  *  - ONE MORE min-label propagation round changes nothing (the
  *    fixed-point certificate — an early-terminated fixpoint fails it);
  *  - dedupWeights: every doc exactly once, cluster_size equals the
  *    actual member count, weight = round(1/size, 9);
  *  - leakageSafeSplits: every doc exactly once, split is exactly the
  *    md5 gate of the cluster id, and (via pair consistency + min-label
  *    clusters) no near-dup pair straddles splits.
  *
  * Pure Spark jobs over the operator outputs — each check returns a
  * VIOLATION COUNT, all of which must be 0. The checks recompute
  * nothing of the algorithm under test beyond the pair generator it
  * consumes (jaccardPairs, which IS oracled at 64×): a broken fixpoint,
  * a dropped vertex, a stale weight, or a leaked split each light up a
  * dedicated counter. CcInvariantsSpec proves the checker catches
  * seeded violations of every class. */
object CcInvariants {
  /** (invariant name, violation count) — every count must be 0.
    *
    * `cacheKey` (r13): the catalog's four CC consumers share ONE
    * session-cached labeling (SparkEntry passes `$dir/documents`), so
    * the production path computes the fixpoint once; a gate that
    * recomputes it per consumer certifies a shape nobody ships AND
    * triples the 1024× cost. Passing the scaled corpus identity here
    * reproduces the production plan exactly — the pair graph the
    * invariants probe is still computed INDEPENDENTLY of the labeling
    * under test. No key = per-call recompute (the spec's corrupted-
    * input paths need isolated frames). */
  def check(documents: DataFrame, threshold: Double = 0.5,
      cacheKey: Option[String] = None, pairSlices: Int = 1)
      : Seq[(String, Long)] = {
    val spark = documents.sparkSession
    // the pair graph, pinned once (every downstream check probes it).
    // pairSlices != 1 (0 = auto-K) = the transient-disk knob for k
    // where the ONE-JOB
    // pair join outruns box disk (4096×, r14 VERDICT item 1); the
    // sliced generator is row-identical (DedupSpec pins it) and shares
    // its persisted slice partials with the fixpoint below via the
    // corpus cacheKey — the probe still consumes the same trusted,
    // 64×-oracled pair GENERATOR, independently of the labeling under
    // test.
    val pairs = (if (pairSlices != 1)
        graft.dedup.Dedup.jaccardPairsSliced(documents,
          threshold = threshold, slices = pairSlices, cacheKey = cacheKey)
      else graft.dedup.Dedup.jaccardPairs(documents, threshold = threshold))
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    val clusters = graft.operators.Pipeline
      .dedupClusters(documents, threshold, cacheKey = cacheKey,
        pairSlices = pairSlices)
      .localCheckpoint(true)
    val weights = graft.operators.Pipeline
      .dedupWeights(documents, threshold, cacheKey = cacheKey)
      .localCheckpoint(true)
    val splits = graft.operators.Pipeline
      .leakageSafeSplits(documents, threshold, cacheKey = cacheKey)
      .localCheckpoint(true)
    checkLabeled(documents, pairs, clusters, weights, splits)
  }

  /** Same checks over ALREADY-COMPUTED operator outputs (so the spec
    * can corrupt one input and watch the right counter fire). */
  def checkLabeled(documents: DataFrame, pairs: DataFrame,
      clusters: DataFrame, weights: DataFrame, splits: DataFrame)
      : Seq[(String, Long)] = {
    val labelOf = clusters.select(col("doc_id"), col("cluster_id"))
    def labeled(df: DataFrame, idCol: String, as: String): DataFrame =
      df.join(labelOf.select(col("doc_id").as(idCol),
        col("cluster_id").as(as)), Seq(idCol), "left_outer")

    // 1. pair consistency: both endpoints of every near-dup pair carry
    //    the same cluster label (a missing label counts as a violation)
    val paired = labeled(labeled(pairs, "doc_a", "la"), "doc_b", "lb")
    val edgeCross = paired.filter(
      col("la").isNull || col("lb").isNull || col("la") =!= col("lb"))
      .count()

    // 2. minimal labeling: label == min(member id) per cluster; every
    //    member's label <= its id; canonical flag == (id == label)
    val labelNotMin = clusters.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("mn"))
      .filter(col("mn") =!= col("cluster_id")).count()
    val labelAboveId = clusters
      .filter(col("cluster_id") > col("doc_id")).count()
    val canonicalWrong = clusters.filter(
      col("is_canonical") =!= (col("doc_id") === col("cluster_id")))
      .count()

    // 3. coverage: the labeled set is exactly the edge-connected
    //    vertex set, each vertex labeled once
    val verts = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val coverage = verts.join(clusters, Seq("doc_id"), "full_outer")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"),
        sum(when(col("cluster_id").isNull, 1).otherwise(0)).as("unlabeled"))
      .filter(col("n") =!= 1 || col("unlabeled") > 0).count()

    // 4. fixed point: one more min-label round changes nothing
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val nbrMin = edges
      .join(labelOf.select(col("doc_id").as("dst"), col("cluster_id")),
        Seq("dst"))
      .groupBy(col("src")).agg(min(col("cluster_id")).as("nbr_min"))
      .select(col("src").as("doc_id"), col("nbr_min"))
    val notFixed = labelOf.join(nbrMin, Seq("doc_id"), "left_outer")
      .filter(least(col("cluster_id"),
        coalesce(col("nbr_min"), col("cluster_id"))) =!= col("cluster_id"))
      .count()

    // 5. dedupWeights: exactly one row per doc; cluster_size is the
    //    real member count of its cluster_id; weight = round(1/size, 9)
    val nDocs = documents.select(col("doc_id")).distinct().count()
    val weightRows = weights.count()
    val weightCoverage = math.abs(weightRows - nDocs) +
      (weightRows - weights.select(col("doc_id")).distinct().count())
    val sizeWrong = weights.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("actual"),
        min(col("cluster_size")).as("mn"), max(col("cluster_size")).as("mx"))
      .filter(col("mn") =!= col("actual") || col("mx") =!= col("actual"))
      .count()
    val weightWrong = weights.filter(col("weight") =!=
      round(lit(1.0) / col("cluster_size").cast("double"), 9)).count()

    // 6. splits: one row per doc; the split is exactly the md5 gate of
    //    the row's cluster id; no near-dup pair straddles splits
    val splitRows = splits.count()
    val splitCoverage = math.abs(splitRows - nDocs) +
      (splitRows - splits.select(col("doc_id")).distinct().count())
    val bucket = substring(md5(col("cluster_id").cast("string")), 1, 1)
    val gate = when(bucket.isin("0", "1", "2", "3", "4", "5", "6", "7",
      "8", "9", "a", "b"), "train")
      .when(bucket.isin("c", "d"), "val").otherwise("test")
    val splitGateWrong = splits.filter(col("split") =!= gate).count()
    val sp = splits.select(col("doc_id"), col("split"))
    val splitLeaks = pairs
      .join(sp.select(col("doc_id").as("doc_a"), col("split").as("sa")),
        Seq("doc_a"))
      .join(sp.select(col("doc_id").as("doc_b"), col("split").as("sb")),
        Seq("doc_b"))
      .filter(col("sa") =!= col("sb")).count()

    Seq(
      "pair_edge_crosses_clusters" -> edgeCross,
      "cluster_label_not_min_member" -> labelNotMin,
      "member_label_above_own_id" -> labelAboveId,
      "canonical_flag_inconsistent" -> canonicalWrong,
      "vertex_coverage_mismatch" -> coverage,
      "extra_propagation_round_changes_labels" -> notFixed,
      "weights_doc_coverage_mismatch" -> weightCoverage,
      "weights_cluster_size_wrong" -> sizeWrong,
      "weights_value_wrong" -> weightWrong,
      "splits_doc_coverage_mismatch" -> splitCoverage,
      "splits_gate_mismatch" -> splitGateWrong,
      "splits_pair_straddles_splits" -> splitLeaks)
  }
}
