package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{EventsPipeline => E, Relational => R}
import graft.text.{TextAnalysis => T}
import graft.dedup.{Dedup => D}
import graft.vector.{Similarity => V}
import graft.multimodal.{Multimodal => M}
import graft.streaming.{StreamingPipeline => S}

/** Driver contract (see SURVEY.md §7 + builder prompt).
  *
  * Every operator in SURVEY.md §2 (plus the LLM-pipeline north-star set) is
  * exposed as a named query; SQL-expressible ones carry DuckDB oracle SQL.
  * Oracle-parity rules applied throughout (SURVEY.md §7 risk register):
  *  - float aggregations go through exact decimal sums (Cols.decSum/decAvg),
  *    emitted as double — deterministic in both engines;
  *  - "now" anchors to max(ts), never the wall clock;
  *  - every oracled query ends in an ORDER BY over a unique key;
  *  - DuckDB integer sums are CAST to BIGINT (DuckDB widens to HUGEINT);
  *  - timestamps flow as native timestamps with session TZ pinned UTC.
  */
object SparkEntry {

  /** Flagship query (reference's historical view, SURVEY.md §3.3) on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    E.historicalRange(Tables.load(spark, "/root/testdata/sf0.001", "events"))

  private def t(name: String)(fn: DataFrame => DataFrame)
      : (SparkSession, String) => DataFrame =
    (s, dir) => fn(Tables.load(s, dir, name))

  private def t2(n1: String, n2: String)(fn: (DataFrame, DataFrame) => DataFrame)
      : (SparkSession, String) => DataFrame =
    (s, dir) => fn(Tables.load(s, dir, n1), Tables.load(s, dir, n2))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference surface: events pipeline (SURVEY.md §2.1-2.8) ----
    "q_hist_range" -> ((s, dir) => E.historicalRangeScan(s, dir)),
    "q_hist_range_7d" -> ((s, dir) => E.historicalRangeScan(s, dir, hours = 168)),
    "q_hist_summary" -> t("events")(E.rangeSummary(_)),
    "q_required_counts" -> t("events")(E.requiredKeyCounts),
    "q_rename_tag" -> t("events")(E.renameTag(_)),
    "q_latest_record" -> t("events")(E.latestRecord),
    "q_time_buckets" -> t("events")(E.timeBuckets),
    "q_grouped_series" -> t("events")(E.groupedSeries),
    "q_labels" -> t("events")(E.labels),
    "q_json_extract" -> t("events")(E.jsonExtract),
    "q_parse_or_drop" -> t("events")(E.parseOrDrop),
    "q_corrupt_records" -> t("events")(E.corruptRecords),
    "q_funnel" -> t("events")(E.funnel),
    "q_retention" -> t("events")(E.retention),
    "q_interarrival" -> t("events")(E.interArrival),
    "q_running_sum" -> t("events")(E.runningSum),
    "q_sessionize" -> t("events")(E.sessionize(_)),
    "q_session_window" -> t("events")(E.sessionWindows(_)),
    "q_neg_sample" -> t("documents")(operators.Pipeline.negativeSamples(_)),
    "q_asof_purchase" -> t("events")(E.asofLastPurchase),
    "q_asof_custom" -> t("events") { ev =>
      import org.apache.spark.sql.functions.col
      // Same semantics as q_asof_purchase, but through the custom
      // sort-merge AsOfJoinExec (plans/AsOfJoin.scala) instead of the
      // window composition — one co-partitioned merge, O(1) state.
      graft.plans.AsOfJoin.asofJoin(
        ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("ts"), col("user_id")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id")),
        keys = Seq("user_id"), ordCols = Seq("ts", "event_id"))
        .select(col("event_id"), col("ts"), col("user_id"),
          col("r_ts").as("last_purchase_ts"))
        .orderBy(col("event_id"))
    },
    "q_asof_forward" -> t("events") { ev =>
      import org.apache.spark.sql.functions.col
      // FORWARD as-of through the same exec: each view enriched with
      // the user's NEXT purchase at or after it (time-to-conversion).
      graft.plans.AsOfJoin.asofJoin(
        ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("ts"), col("user_id")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id")),
        keys = Seq("user_id"), ordCols = Seq("ts", "event_id"),
        direction = "forward")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("r_ts").as("next_purchase_ts"))
        .orderBy(col("event_id"))
    },
    "q_asof_nearest" -> t("events")(E.asofNearestPurchase),
    "q_tumbling_hourly" -> t("events")(E.tumblingHourly),
    "q_dense_series" -> t("events")(E.denseHourlySeries),
    "q_interpolate" -> t("events")(E.interpolateHourly),
    // ---- generalized relational inventory (SURVEY.md §2.3-2.6) ----
    "q1_pricing_summary" -> t("lineitem")(R.q1PricingSummary),
    "q_join_priority" -> t2("lineitem", "orders")(R.revenueByPriority),
    "q_join_segment" -> t2("orders", "customer")(R.revenueBySegment),
    "q_regional_revenue" -> ((s, dir) => R.regionalRevenue(s, dir)),
    "q_ratio_to_report" -> ((s, dir) => R.revenueShareByNation(s, dir)),
    "q_benford" -> t("orders")(operators.Extended.benfordDigits),
    "q_bitmap_distinct" ->
      t("events")(operators.Extended.bitmapDistinctUsers),
    "q_outer_join" -> t2("customer", "orders")(R.ordersPerCustomer),
    "q_semi_join" -> t2("customer", "orders")(R.customersWithOrders),
    "q_anti_join" -> t2("customer", "orders")(R.customersWithoutOrders),
    "q_theta_join" -> t2("supplier", "customer")(R.acctbalTheta),
    "q_theta_hist" -> t2("supplier", "customer")(R.acctbalThetaViaHistogram),
    "q_strict_rank" -> t2("supplier", "customer")(R.customerRankAmongSuppliers),
    "q_cross_join" -> t2("region", "nation")(R.regionNationCross),
    "q_window_top3" -> t("orders")(R.top3OrdersPerCustomer),
    "q_zorder" -> t("orders") { o =>
      import org.apache.spark.sql.functions.{col, expr}
      // Morton code of (custkey, order epoch-day): the write-layout key
      // for 2-D file pruning (functions/LayoutExpressions.scala). The
      // z-values themselves are oracled — pure integer bit arithmetic.
      o.select(col("o_orderkey"),
          graft.functions.ZValue.zvalue(col("o_custkey"),
            expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)")).as("zval"))
        .orderBy(col("zval"), col("o_orderkey"))
        .limit(1000)
    },
    "q_hilbert" -> t("orders") { o =>
      import org.apache.spark.sql.functions.{col, expr}
      // Hilbert index of the same (custkey, epoch-day) pair as q_zorder
      // — the locality-tighter layout key (functions/HilbertValue).
      o.select(col("o_orderkey"),
          graft.functions.HilbertValue.hilbert(col("o_custkey"),
            expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)")).as("hval"))
        .orderBy(col("hval"), col("o_orderkey"))
        .limit(1000)
    },
    "q_zorder_range" -> t("orders") { o =>
      import org.apache.spark.sql.functions.{col, expr}
      // The read pattern the z-order layout serves: a 2-D box query
      // becomes z BETWEEN z(lo,lo) AND z(hi,hi) — a sargable 1-D range
      // over the layout key that row-group stats prune — plus the exact
      // box residual (the curve exits the box between the corner codes).
      val day = expr(
        "cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)")
      val z = graft.functions.ZValue.zvalue(col("o_custkey"), day)
      val zLo = graft.functions.ZValue.interleave(40L, 9500L)
      val zHi = graft.functions.ZValue.interleave(90L, 10000L)
      o.select(col("o_orderkey"), col("o_custkey"), day.as("day"),
          z.as("zval"))
        .filter(col("zval").between(zLo, zHi) &&
          col("o_custkey").between(40L, 90L) &&
          col("day").between(9500L, 10000L))
        .orderBy(col("o_orderkey"))
    },
    "q_hilbert_range" -> t("orders") { o =>
      import org.apache.spark.sql.functions.{col, expr}
      // The read pattern the HILBERT layout serves: unlike Morton (one
      // corner-bounded range), a 2-D box maps to a SET of curve ranges —
      // HilbertValue.boxRanges decomposes the box on the driver (pure
      // geometry on query constants), and the scan filter is the sargable
      // OR-of-BETWEENs over the layout key plus the exact box residual.
      val day = expr(
        "cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)")
      val h = graft.functions.HilbertValue.hilbert(col("o_custkey"), day)
      val ranges = graft.functions.HilbertValue
        .boxRanges(40L, 90L, 9500L, 10000L)
      // InLongRanges (binary search, child evaluated once) — an
      // OR-of-BETWEENs would inline the Hilbert walk into every
      // comparison after project-filter collapse (~128 evals/row)
      val inRanges = graft.functions.InLongRanges
        .inRanges(col("hval"), ranges)
      o.select(col("o_orderkey"), col("o_custkey"), day.as("day"),
          h.as("hval"))
        .filter(inRanges && col("o_custkey").between(40L, 90L) &&
          col("day").between(9500L, 10000L))
        .orderBy(col("o_orderkey"))
    },
    "q_topk_custom" -> t("orders")(o =>
      graft.plans.TopKPerGroup.topKPerGroup(
        o.select(org.apache.spark.sql.functions.col("o_custkey"),
          org.apache.spark.sql.functions.col("o_orderkey"),
          org.apache.spark.sql.functions.col("o_totalprice")),
        Seq("o_custkey"),
        Seq("o_totalprice" -> true, "o_orderkey" -> false),
        k = 3)
        .orderBy(org.apache.spark.sql.functions.col("o_custkey"),
          org.apache.spark.sql.functions.col("o_totalprice").desc,
          org.apache.spark.sql.functions.col("o_orderkey"))),
    "q_topk_orders" -> t("orders")(R.topOrders(_)),
    "q_distinct_parts" -> t("lineitem")(R.distinctParts),
    "q_approx_distinct" -> t("lineitem")(R.approxDistinctParts),
    "q_rollup" -> t("lineitem")(R.rollupQtyByFlagStatus),
    "q_cube" -> t("lineitem")(R.cubeQtyByFlagStatus),
    "q_union" -> t2("customer", "orders")(R.unionHighValueCustomers),
    "q_intersect" -> t2("customer", "orders")(R.intersectHighValueCustomers),
    "q_except" -> t2("customer", "orders")(R.exceptHighValueCustomers),
    "q_distinct_shapes" -> t("events")(R.distinctEventShapes),
    "q_grouping_sets" -> ((s, dir) =>
      operators.Extended.groupingSets(s, Tables.load(s, dir, "lineitem"))),
    "q_percentile" -> t("lineitem")(operators.Extended.percentiles),
    "q_approx_percentile" -> t("lineitem")(operators.Extended.approxPercentiles),
    "q_math_fns" -> t("lineitem")(operators.Extended.mathFunctions),
    "q_array_ops" -> t("embeddings")(operators.Extended.arrayFunctions),
    "q_json_roundtrip" -> t("events")(operators.Extended.jsonRoundtrip),
    "q_map_fns" -> t("events")(operators.Extended.mapFunctions),
    "q_variant_extract" -> t("events")(operators.Extended.variantExtract),
    "q_interval_join" -> t("events")(E.intervalJoinBinned),
    "q_upsert_latest" -> t("events")(E.upsertLatest),
    "q_trailing_1h" -> t("events")(E.trailingHourSum),
    "q_scd2" -> t("events")(E.scd2Build),
    "q_cdc_apply" -> t("events")(E.cdcApply),
    "q_range_bands" -> t("events")(E.rangeBandCounts(_)),
    // custom operator #4: key equality + range containment in one
    // probe (the SCD2 / per-category-grid lookup shape).
    "q_range_bands_keyed" -> t("events")(E.keyedRangeBandCounts(_)),
    // custom operator #4 LEFT OUTER: SCD2 lookup where facts outside
    // every version's validity window survive as version -1.
    "q_scd2_lookup" -> t("events")(E.scd2RateLookup(_)),
    // custom operator #5: interval x interval OVERLAP join (sessions
    // vs maintenance windows) - no equi key exists, native plan is BNLJ.
    "q_overlap_join" -> t("events")(E.sessionOverlapWindows(_)),
    // the same three range-join queries with the BINNED EQUI-JOIN
    // fallback (the over-ceiling plan a 100x build side takes —
    // plans/BinnedRangeFallback) forced through the explicit
    // forceBinned parameter, so the fallback is driver-oracled
    // end-to-end, not just spec-pinned. The parameter scopes the flip
    // to THIS call — no session-conf mutation that a concurrent
    // range-join construction could observe (ADVICE r12).
    "q_range_bands_binned" -> ((s, dir) =>
      E.rangeBandCounts(Tables.load(s, dir, "events"),
        forceBinned = true)),
    "q_scd2_lookup_binned" -> ((s, dir) =>
      E.scd2RateLookup(Tables.load(s, dir, "events"),
        forceBinned = true)),
    "q_overlap_join_binned" -> ((s, dir) =>
      E.sessionOverlapWindows(Tables.load(s, dir, "events"),
        forceBinned = true)),
    "q_ewma" -> t("events")(E.ewma),
    "q_transitions" -> t("events")(E.transitions),
    "q_skyline" -> t("part")(operators.Extended.skylineParts),
    "q_winsorized" -> t("events")(E.winsorizedStats),
    "q_incr_agg" -> t("events")(E.incrementalAggMerge(_)),
    "q_table_diff" -> t("events")(operators.Pipeline.tableDiffSummary),
    "q_salted_agg" -> t("events")(operators.Skew.saltedValueSums(_)),
    "q_skew_report" -> t("lineitem")(operators.Skew.skewReport),
    "q_salted_join" ->
      t2("lineitem", "orders")(operators.Skew.saltedRevenueByPriority),
    "q_join_card" -> t2("lineitem", "orders")(R.joinCardinality),
    "q_top_ngrams" -> t("documents")(T.topNgrams(_)),
    "q_length_histogram" -> t("documents")(T.lengthHistogram(_)),
    "q_dedup_decisions" -> t("documents")(operators.Pipeline.dedupDecisions(_)),
    "q_dedup_incremental" -> t("documents")(D.incrementalDedup(_)),
    "q_pagerank" -> t("lineitem")(operators.Graph.pagerank(_)),
    "q_bfs_hops" -> t("lineitem")(operators.Graph.bfsHops(_)),
    "q_label_prop" -> t("lineitem")(operators.Graph.labelPropagation(_)),
    "q_time_weighted_avg" -> t("events")(E.timeWeightedAvg),
    "q_sliding_distinct" -> t("events")(E.slidingDistinct),
    "q_streaks" -> t("events")(E.activityStreaks),
    "q_contingency" -> t("events")(E.contingencyChi2),
    "q_autocorrelation" -> t("events")(E.dailyAutocorrelation(_)),
    "q_cusum" -> t("events")(E.cusumDaily),
    "q_rolling_median" -> t("events")(E.rollingMedianDaily(_)),
    "q_decay_score" -> t("events")(E.decayedPopularity),
    "q_ref_integrity" -> ((s, dir) =>
      operators.Extended.refIntegrity(s, dir)),
    "q_triangles" -> t("lineitem")(operators.Graph.triangles(_)),
    "q_synth_source" -> ((s, _) => {
      import org.apache.spark.sql.functions._
      // Custom DSv2 generator source (sources/SyntheticEventsSource) —
      // the pushed id-range narrows GENERATION, verified in SourcesSpec.
      s.read.format("graft.sources.SyntheticEventsSource")
        .option("n", 100000).option("slices", 8).load()
        .filter(col("event_id") >= 25000 && col("event_id") < 75000)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .orderBy(col("event_type"))
    }),
    "q_dpp_date" -> ((s, dir) => sources.Sources.dppDateRollup(s, dir)),
    // co-located bucketed fact⋈fact join: zero exchanges before the SMJ
    "q_bucket_join" -> ((s, dir) => sources.Sources.bucketedJoinAgg(s, dir)),
    "q_bpe_tokens" -> t("documents")(T.bpeTokenStats(_)),
    "q_fertility" -> t("documents")(T.tokenizerFertility(_)),
    "q_bpe_train" -> t("documents")(T.bpeTrain(_)),
    "q_hll_mergeable" -> t("events")(operators.Extended.approxUsersBySketch),
    "q_kll_mergeable" -> t("events")(operators.Extended.kllValueQuantiles),
    "q_theta_overlap" -> t("events")(operators.Extended.thetaOverlap),
    // sketch ERROR BOUNDS, oracled: estimate+exact in one Spark pass →
    // within-bound booleans; DuckDB recomputes the exact side and pins
    // the booleans TRUE (the SketchSpec invariants in the driver gate)
    "q_hll_bound" -> t("events")(operators.Extended.hllBound),
    "q_kll_bound" -> t("events")(operators.Extended.kllBound),
    "q_theta_bound" -> t("events")(operators.Extended.thetaBound),
    "q_cms_freq" -> t("events")(operators.Extended.cmsFrequencies(_)),
    "q_substring_dedup" -> t("documents")(D.substringDedup(_)),
    "q_sorted_neighborhood" -> t("documents")(D.sortedNeighborhoodPairs(_)),
    "q_fuzzy_join" -> t("documents")(D.fuzzyJoinPairs(_)),
    "q_fuzzy_jw" -> t("documents")(D.fuzzyJoinJaroWinkler(_)),
    "q_boilerplate" -> t("documents")(T.boilerplateScan(_)),
    "q_equidepth_hist" -> t("lineitem")(R.equiDepthHistogram(_)),
    "q_shipping_priority" -> ((s, dir) => R.shippingPriority(
      Tables.load(s, dir, "customer"), Tables.load(s, dir, "orders"),
      Tables.load(s, dir, "lineitem"))),
    "q_mad_outliers" -> t("events")(R.madOutliers(_)),
    // the four CC-labeling consumers share one session-cached label
    // artifact (disk-backed parquet via SessionDirs — see dedupClusters)
    "q_dedup_clusters" -> ((s, dir) => operators.Pipeline.dedupClusters(
      Tables.load(s, dir, "documents"),
      cacheKey = Some(s"$dir/documents"))),
    "q_dedup_weights" -> ((s, dir) => operators.Pipeline.dedupWeights(
      Tables.load(s, dir, "documents"),
      cacheKey = Some(s"$dir/documents"))),
    "q_budget_select" -> t("documents")(operators.Pipeline.budgetSelect(_)),
    // DSIR-style target-affinity selection via exact integer
    // likelihood-ratio votes (no libm log anywhere)
    "q_importance" -> t("documents")(operators.Pipeline.importanceScore(_)),
    "q_cluster_canonical" -> ((s, dir) => operators.Pipeline
      .clusterCanonical(Tables.load(s, dir, "documents"),
        cacheKey = Some(s"$dir/documents"))),
    "q_heavy_hitters" -> t("documents")(T.heavyHitters(_)),
    "q_tfidf" -> t("documents")(T.topTfidfTerms(_)),
    "q_chunked" -> t("documents")(T.chunkDocuments(_)),
    "q_pii_scrub" -> t("documents")(T.scrubPii),
    "q_pack_greedy" -> t("documents")(operators.Pipeline.packGreedy(_)),
    "q_pack_bpe" -> t("documents")(operators.Pipeline.packGreedyBpe(_)),
    "q_split_leakage" -> ((s, dir) => operators.Pipeline
      .leakageSafeSplits(Tables.load(s, dir, "documents"),
        cacheKey = Some(s"$dir/documents"))),
    "q_stratified_sample" -> t("documents")(operators.Pipeline.stratifiedSample),
    "q_contamination" -> t("documents")(operators.Pipeline.contaminationScan(_)),
    // fractional n-gram benchmark decontamination (the per-doc decision)
    "q_decontaminate" -> t("documents")(operators.Pipeline.decontamination(_)),
    "q_quantize" -> t("embeddings")(operators.Pipeline.quantizeEmbeddings),
    "q_embed_cov" -> t("embeddings")(vector.Similarity.embeddingCovariance),
    "q_power_iter" -> t("embeddings")(vector.Similarity.powerIteration(_)),
    "q_pca_project" -> t("embeddings")(vector.Similarity.pcaProject(_)),
    "q_pca_top2" -> t("embeddings")(vector.Similarity.pcaTop2(_)),
    "q_pca_topk" -> t("embeddings")(vector.Similarity.pcaTopK(_)),
    "q_rand_proj" -> t("embeddings")(vector.Similarity.randomProjection(_)),
    "q_mean_pairwise" -> t("embeddings")(vector.Similarity.meanPairwiseDot),
    "q_pmi" -> t("documents")(T.pmiCollocations(_)),
    // the three classifier queries share the session weight cache
    // (q_lr_learnable and q_calibration train the IDENTICAL length
    // model; without the key each re-runs the 8 gradient jobs — the
    // lloydSeq train-once-serve-all precedent, r16)
    "q_lr_quality" -> ((s, dir) => text.QualityModel.trainAndScore(
      Tables.load(s, dir, "documents"),
      cacheKey = Some(s"$dir/documents"))),
    "q_lr_learnable" -> ((s, dir) => text.QualityModel.trainAndScoreLength(
      Tables.load(s, dir, "documents"),
      cacheKey = Some(s"$dir/documents"))),
    "q_calibration" -> ((s, dir) => text.QualityModel.calibration(
      Tables.load(s, dir, "documents"),
      cacheKey = Some(s"$dir/documents"))),
    "q_split_assign" -> t("documents")(operators.Pipeline.splitAssignments),
    "q_temperature_resample" ->
      t("documents")(operators.Pipeline.temperatureResample(_)),
    "q_corpus_sample" -> t("documents")(operators.Pipeline.corpusSample(_)),
    "q_brand_revenue" -> t2("lineitem", "part")(R.revenueByBrand),
    "q_supplier_balances" -> t2("supplier", "nation")(R.supplierBalances),
    "q_variance" -> t("events")(R.valueVariance),
    "q_mode" -> t("events")(R.modalEventType),
    "q_string_agg" -> t("customer")(R.namesPerSegment),
    "q_correlation" -> t("lineitem")(R.qtyPriceCorrelation),
    "q_regression" -> t("lineitem")(R.qtyPriceRegression),
    "q_nullsafe_join" -> t("orders")(R.nullSafeJoin),
    "q_na_clean" -> t("customer")(operators.Extended.naClean),
    "q_typed_agg" -> ((s, dir) =>
      operators.Extended.typedOrderStats(s, Tables.load(s, dir, "orders"))),
    "q_cogroup" -> ((s, dir) =>
      operators.Extended.cogroupUserActivity(
        s, Tables.load(s, dir, "events"))),
    "q_decl_agg" -> t("orders")(o => o
      .groupBy(org.apache.spark.sql.functions.col("o_orderpriority"))
      .agg(functions.DeclarativeAggregates
        .centsSum(org.apache.spark.sql.functions.col("o_totalprice"))
        .as("total_cents"))
      .orderBy(org.apache.spark.sql.functions.col("o_orderpriority"))),
    "q_window_suite" -> t("orders")(operators.Extended.windowSuite),
    "q_string_fns" -> t("customer")(operators.Extended.stringFunctions),
    "q_date_fns" -> t("orders")(operators.Extended.dateFunctions),
    "q_null_fns" -> t2("customer", "orders")(operators.Extended.nullFunctions),
    "q_pivot" -> t("events")(operators.Extended.pivotEventCounts),
    "q_unpivot" -> t("lineitem")(operators.Extended.unpivotMeasures),
    "q_posexplode" -> t("documents")(operators.Extended.posexplodeTokens),
    "q_anomaly_batch" -> t("events")(E.anomalies),
    "q_bloom_join" -> t2("lineitem", "orders")(operators.Skew.bloomRevenueByPriority),
    "q_sql_cte" -> ((s, dir) =>
      operators.SqlSurface.run(s, dir, operators.SqlSurface.cte)),
    "q_sql_scalar_subquery" -> ((s, dir) =>
      operators.SqlSurface.run(s, dir, operators.SqlSurface.scalarSubquery)),
    "q_sql_correlated" -> ((s, dir) =>
      operators.SqlSurface.run(s, dir, operators.SqlSurface.correlatedSubquery)),
    "q_sql_in_subquery" -> ((s, dir) =>
      operators.SqlSurface.run(s, dir, operators.SqlSurface.inSubquery)),
    "q_sql_exists" -> ((s, dir) =>
      operators.SqlSurface.run(s, dir, operators.SqlSurface.existsSubquery)),
    "q_sql_lateral" -> ((s, dir) =>
      operators.SqlSurface.run(s, dir, operators.SqlSurface.lateralJoin)),
    "q_recursive_cte" -> ((s, dir) =>
      operators.SqlSurface.run(s, dir, operators.SqlSurface.recursiveCte)),
    // the custom native expressions through parser + FunctionRegistry
    "q_sql_custom_fns" -> ((s, dir) =>
      operators.SqlSurface.runWithCustomFns(s, dir)),
    // ---- TPC-H classic shapes ----
    "q_promo_share" -> t2("lineitem", "part")(R.promoRevenueShare),
    "q_large_orders" -> ((s, dir) => R.largeOrders(
      Tables.load(s, dir, "customer"), Tables.load(s, dir, "orders"),
      Tables.load(s, dir, "lineitem"))),
    "q_returned_items" -> ((s, dir) => R.returnedItems(
      Tables.load(s, dir, "customer"), Tables.load(s, dir, "orders"),
      Tables.load(s, dir, "lineitem"), Tables.load(s, dir, "nation"))),
    "q_forecast_revenue" -> t("lineitem")(R.forecastRevenue),
    "q_min_cost_supplier" -> ((s, dir) => R.minCostSupplier(
      Tables.load(s, dir, "part"), Tables.load(s, dir, "supplier"),
      Tables.load(s, dir, "nation"), Tables.load(s, dir, "region"),
      Tables.load(s, dir, "lineitem"))),
    "q_product_profit" -> ((s, dir) => R.productTypeProfit(
      Tables.load(s, dir, "lineitem"), Tables.load(s, dir, "part"),
      Tables.load(s, dir, "supplier"), Tables.load(s, dir, "nation"))),
    "q_important_parts" -> ((s, dir) => R.importantParts(
      Tables.load(s, dir, "lineitem"), Tables.load(s, dir, "supplier"),
      Tables.load(s, dir, "nation"), Tables.load(s, dir, "region"))),
    "q_ship_modes" -> t2("lineitem", "orders")(R.shipModes),
    "q_part_supp_counts" -> ((s, dir) => R.partSupplierCounts(
      Tables.load(s, dir, "lineitem"), Tables.load(s, dir, "part"),
      Tables.load(s, dir, "supplier"))),
    "q_promo_suppliers" -> ((s, dir) => R.promoSuppliers(
      Tables.load(s, dir, "lineitem"), Tables.load(s, dir, "part"),
      Tables.load(s, dir, "supplier"), Tables.load(s, dir, "nation"),
      Tables.load(s, dir, "region"))),
    "q_nation_trade" -> ((s, dir) => R.nationTradeVolume(s, dir)),
    "q_cust_distribution" -> t2("customer", "orders")(R.custOrderDistribution),
    "q_top_supplier" -> ((s, dir) => R.topSupplier(s, dir)),
    "q_small_qty_revenue" -> t2("lineitem", "part")(R.smallQtyRevenue),
    "q_disjunctive_revenue" -> t2("lineitem", "part")(R.disjunctiveRevenue),
    "q_priority_check" -> t2("orders", "lineitem")(R.orderPriorityCheck),
    "q_local_supplier" -> ((s, dir) => R.localSupplierVolume(s, dir)),
    "q_market_share" -> ((s, dir) => R.marketShare(s, dir)),
    "q_waiting_suppliers" -> ((s, dir) => R.waitingSuppliers(s, dir)),
    "q_dormant_customers" -> t2("customer", "orders")(R.dormantCustomers),
    "q_rfm_segments" -> t("orders")(R.rfmSegments),
    "q_copurchase" -> t("lineitem")(R.copurchasePairs(_)),
    "q_view_attribution" -> t("events")(E.viewAttribution),
    "q_source_quota" -> t("documents")(operators.Pipeline.sourceQuota(_)),
    "q_epoch_shuffle" ->
      t("documents")(operators.Pipeline.deterministicShuffle(_)),
    "q_weighted_sample" ->
      t("documents")(operators.Pipeline.weightedSample(_)),
    "q_waterfill" ->
      t("documents")(operators.Pipeline.tokenBudgetWaterfill(_)),
    "q_dedup_rate" ->
      t("documents")(operators.Pipeline.dedupRateBySource),
    "q_pipeline_e2e" ->
      t("documents")(operators.Pipeline.pretrainPipeline(_)),
    "q_topk_share" ->
      t("orders")(operators.Extended.topKRevenueShare(_)),
    "q_monthly_growth" -> t("orders")(operators.Extended.monthlyGrowth),
    "q_calendar_dim" -> t("orders")(operators.Extended.calendarDim),
    "q_quality_sweep" -> t("documents")(operators.Pipeline.qualitySweep),
    "q_profile" -> t("orders")(operators.Extended.profileOrders),
    "q_table_checksum" -> t("orders")(operators.Extended.tableChecksum),
    // ---- text analysis (north star) ----
    "q_token_stats" -> t("documents")(T.tokenStats),
    "q_diversity" -> t("documents")(T.lexicalDiversity),
    "q_corpus_stats" -> t("documents")(T.corpusStats),
    "q_vocab_growth" -> t("documents")(T.vocabGrowth(_)),
    "q_ks_test" -> t("documents")(T.lengthKs(_)),
    "q_gini" -> t("orders")(operators.Extended.giniRevenue),
    "q_weighted_median" ->
      t("lineitem")(operators.Extended.weightedMedianQty),
    "q_quality" -> t("documents")(T.qualityScores),
    "q_repetition" -> t("documents")(T.repetitionRatio(_)),
    // Gopher Table-A1 repetition gates: top-2-gram and duplicated-
    // 5-gram character coverage + the keep decision
    "q_gopher_rep" -> t("documents")(T.gopherRepetition(_)),
    "q_lang_id" -> t("documents")(T.languageId),
    "q_md5_fp" -> t("documents")(T.md5Fingerprints),
    "q_rolling_fp" -> t("documents")(T.rollingFingerprints),
    "q_bm25" -> t("documents")(T.bm25Rank(_)),
    "q_hybrid" ->
      t2("documents", "embeddings")(operators.Pipeline.hybridSearch(_, _)),
    "q_char_entropy" -> t("documents")(T.charEntropy(_)),
    "q_bigram_lm" -> t("documents")(T.bigramLogProb(_)),
    // ---- deduplication (north star) ----
    "q_dedup_exact" -> t("documents")(D.exactDedup),
    "q_dedup_digest" -> t("documents")(D.exactDedupByDigest),
    "q_jaccard_pairs" -> t("documents")(D.jaccardPairs(_)),
    // Hash-sliced sequential form of the same pair join (the
    // transient-disk knob the 4096× gate runs on) — row-identical to
    // jaccardPairs by construction, so it shares the exact quadratic
    // oracle shape. Demo'd over the even-doc_id HALF corpus at K=2
    // (r15 VERDICT item 5: the multi-slice machinery — slice scans,
    // interleaved merge+prune, final-step threshold-emit — at half
    // the corpus-scan price of a full-corpus demo; job-launch
    // overhead dominates this entry, so the demo is the smallest
    // config that still exercises every phase. The knob's real scale
    // and slice counts live in the 4096× gate, not the catalog;
    // DedupSpec pins K∈{3,8} and both merge granularities).
    "q_jaccard_sliced" -> t("documents")(d =>
      D.jaccardPairsSliced(d.filter("doc_id % 2 = 0"),
        slices = 2)),
    // Broder's asymmetric companion: |A∩B|/|A| ≥ 0.9 — flags subset
    // duplication (quote inclusion) symmetric Jaccard misses.
    "q_containment" -> t("documents")(D.containmentPairs(_)),
    "q_jaccard_prefix" -> t("documents")(D.jaccardPrefixPairs(_)),
    // Production threshold (t=0.8): the prefix is |d|−⌈0.8|d|⌉+1 ≈ 0.2|d|
    // (vs 0.6|d| at the 0.4 demo threshold), so the index holds only the
    // rare tail and the verify join's candidate volume collapses — the
    // selectivity regime PPJoin exists for (SCALING.md measures the drop).
    "q_jaccard_prefix_hi" ->
      t("documents")(D.jaccardPrefixPairs(_, threshold = 0.8)),
    "q_minhash_lsh" -> t("documents")(D.minhashLshPairs(_)),
    "q_minhash_neutral" -> t("documents")(D.minhashLshPairsNeutral(_)),
    "q_minhash_est" -> t("documents")(D.minhashEstimate(_)),
    // recall of the banded LSH gate vs exact-Jaccard truth, by decile —
    // the missed-pair curve for the (k=16, bands=4) operating point, at
    // the production truth threshold (t=0.8: the PPJoin truth side is
    // ~10× smaller than the t=0.4/0.5 demo regime — SCALING.md)
    "q_lsh_recall" -> t("documents")(D.lshRecall(_, threshold = 0.8)),
    "q_source_overlap" -> t("documents")(D.sourceOverlap(_)),
    "q_simhash_pairs" -> t("documents")(D.simhashPairs(_)),
    "q_simhash_neutral" -> t("documents")(D.simhashPairsNeutral(_)),
    // ---- similarity search (north star) ----
    "q_pairwise_cosine" -> t("embeddings")(V.pairwiseCosine(_)),
    "q_knn_brute" -> t("embeddings")(V.bruteForceTopK(_)),
    "q_hard_negatives" -> t("embeddings")(V.hardNegatives(_)),
    "q_knn_quantized" -> t("embeddings")(V.quantizedTopK(_)),
    "q_knn_pq" -> t("embeddings")(V.pqTopK(_)),
    "q_knn_lsh" -> t("embeddings")(V.lshTopK(_)),
    "q_knn_lsh_mp" -> t("embeddings")(V.lshTopKMultiProbe(_)),
    "q_knn_ivf" -> t("embeddings")(V.ivfTopK(_)),
    "q_knn_ivf_disk" -> ((s, dir) => V.ivfDiskTopK(s, dir)),
    "q_knn_ivf_mp" -> t("embeddings")(V.ivfTopK(_, nprobe = 2)),
    "q_knn_ivf_refined" -> t("embeddings")(V.ivfRefinedTopK(_)),
    // Multi-round Lloyd trainer (R=3): per-(round, cluster) member
    // counts + inertia; total inertia non-increasing pinned in
    // SimilaritySpec. The cacheKey shares the trained centroid
    // sequence with the other Lloyd-family queries in this session
    // (q_knn_ivf_trained / q_ann_recall_ivf train a 2-round PREFIX of
    // the same model — VERDICT r11 item 3: train once, serve all).
    "q_kmeans" -> ((s, dir) => V.kmeansTrain(
      Tables.load(s, dir, "embeddings"),
      cacheKey = Some(s"lloyd:$dir/embeddings"))),
    // IVF serving the trained quantizer: lists = final-round Lloyd
    // assignment, probe = d²-nearest trained centroid.
    "q_knn_ivf_trained" -> ((s, dir) => V.ivfTrainedTopK(
      Tables.load(s, dir, "embeddings"),
      cacheKey = Some(s"lloyd:$dir/embeddings"))),
    // recall@k of the trained index vs brute force at nprobe 1 and 2 —
    // the probe-budget acceptance curve (trains once, serves both).
    "q_ann_recall_ivf" -> ((s, dir) => V.ivfTrainedRecall(
      Tables.load(s, dir, "embeddings"),
      cacheKey = Some(s"lloyd:$dir/embeddings"))),
    "q_ann_recall" -> t("embeddings")(V.annRecall(_)),
    "q_pq_recall" -> t("embeddings")(V.pqRecall(_)),
    // fixture embeddings are near-random (max within-cluster cos ≈0.5),
    // so the near-dup demos run at threshold 0.35 to exercise nonzero
    // output; 0.9 stays the operator default for real corpora.
    "q_cosine_neardup" ->
      t("embeddings")(V.cosineNearDupPairs(_, threshold = 0.35)),
    "q_semdedup" -> t("embeddings")(V.semDedup(_)),
    "q_domain_assign" -> t("embeddings")(V.domainAssign),
    // ---- multimodal plumbing (north star) ----
    "q_media_stats" -> t("documents")(M.payloadStats),
    "q_media_features" -> ((s, dir) =>
      M.featurePipeline(s, Tables.load(s, dir, "documents"))),
    "q_media_frames" -> ((s, dir) =>
      M.framePipeline(s, Tables.load(s, dir, "documents"))),
    // ---- structured streaming (SURVEY.md §2.8) ----
    "q_stream_windowed" -> ((s, dir) => S.runWindowedBatch(s, dir)),
    "q_stream_sessions" -> ((s, dir) => S.runSessionBatch(s, dir)),
    "q_synth_stream" -> ((s, _) => S.runSyntheticStream(s)),
    // streaming exact dedup over an at-least-once (redelivering) source:
    // the drained kept-set must equal ONE delivery per id (see
    // StreamingPipeline.runDedupStream)
    "q_stream_dedup" -> ((s, _) => S.runDedupStream(s))
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL — one entry per SQL-expressible query above.
  // Omitted (rows-only check):
  // q_approx_distinct / q_approx_percentile / q_hll_mergeable /
  // q_kll_mergeable / q_theta_overlap
  // (approximate by design — the ESTIMATES are engine-native; their
  // error BOUNDS are driver-oracled via q_hll_bound / q_kll_bound /
  // q_theta_bound, and SketchSpec pins the merge laws),
  // q_minhash_lsh / q_simhash_pairs (engine-specific hashing — the
  // neutral-hash variant q_minhash_neutral IS oracled).
  // ---------------------------------------------------------------------

  /** Brute-force kNN oracle — also embedded as a subquery in the
    * q_ann_recall oracle. */
  /** Quantized-scan kNN oracle: int8 reconstruction + coarse top-30 +
    * exact rerank, the same affine/rounding arithmetic as the plan. */
  private val knnQuantizedOracleSql: String = {
    def cosSql(a: String, b: String): String =
      s"""round(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))
            / (sqrt(list_sum(list_transform(range(1, 65), i -> $a[i] * $a[i])))
               * sqrt(list_sum(list_transform(range(1, 65), i -> $b[i] * $b[i])))),
            6)"""
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings),
       rv AS (SELECT vec_id, e,
          CASE WHEN list_max(e) = list_min(e) THEN e
          ELSE list_transform(e, x -> list_min(e)
            + round((x - list_min(e)) / (list_max(e) - list_min(e)) * 255)
              / 255.0 * (list_max(e) - list_min(e))) END AS r
         FROM v),
       q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
       c AS (SELECT query_id, vec_id, e, qe,
          ${cosSql("qe", "r")} AS coarse
         FROM rv CROSS JOIN q WHERE vec_id <> query_id),
       cr AS (SELECT query_id, vec_id, e, qe, coarse,
          row_number() OVER (PARTITION BY query_id
            ORDER BY coarse DESC, vec_id) AS crank
         FROM c),
       ex AS (SELECT query_id, vec_id,
          ${cosSql("qe", "e")} AS cos
         FROM cr WHERE crank <= 30),
       r2 AS (SELECT query_id, vec_id, cos,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
         FROM ex)
       SELECT query_id, rank, vec_id, round(cos, 3) AS cos
       FROM r2 WHERE rank <= 10 ORDER BY query_id, rank"""
  }

  private val knnBruteOracleSql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings),
       q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
       c AS (SELECT query_id, vec_id,
          round(list_sum(list_transform(range(1, 65), i -> qe[i] * e[i]))
            / (sqrt(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])))
               * sqrt(list_sum(list_transform(range(1, 65), i -> e[i] * e[i])))),
            6) AS cos
         FROM v CROSS JOIN q WHERE vec_id <> query_id),
       r AS (SELECT query_id, vec_id, cos,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
         FROM c)
       SELECT query_id, rank, vec_id, round(cos, 3) AS cos
       FROM r WHERE rank <= 10 ORDER BY query_id, rank"""

  /** IVF oracle (exact-decimal centroids), parameterized by how many
    * nearest centroid lists each query probes. */
  private def ivfOracleSql(nprobe: Int): String =
    s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
         dims AS (SELECT label, CAST(unnest(range(64)) AS INTEGER) AS pos,
            unnest(e) AS x FROM v),
         cent AS (SELECT label, pos,
            CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS m
           FROM dims GROUP BY label, pos),
         cvec AS (SELECT label, list(m ORDER BY pos) AS c
           FROM cent GROUP BY label),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
         probe AS (SELECT query_id, qe, label AS probe_label FROM (
            SELECT q.query_id, q.qe, cvec.label,
              row_number() OVER (PARTITION BY q.query_id ORDER BY
                list_sum(list_transform(range(1, 65), j -> qe[j] * c[j]))
                  / (sqrt(list_sum(list_transform(range(1, 65), j -> qe[j] * qe[j])))
                     * sqrt(list_sum(list_transform(range(1, 65), j -> c[j] * c[j]))))
                DESC, cvec.label) AS r
            FROM q CROSS JOIN cvec) WHERE r <= $nprobe),
         c2 AS (SELECT query_id, v.vec_id,
            round(list_sum(list_transform(range(1, 65), j -> qe[j] * e[j]))
              / (sqrt(list_sum(list_transform(range(1, 65), j -> qe[j] * qe[j])))
                 * sqrt(list_sum(list_transform(range(1, 65), j -> e[j] * e[j])))),
              6) AS cos
           FROM v JOIN probe
             ON v.label = probe.probe_label AND v.vec_id <> probe.query_id),
         r2 AS (SELECT query_id, vec_id, cos,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS INTEGER) AS rank FROM c2)
         SELECT query_id, rank, vec_id, round(cos, 3) AS cos
         FROM r2 WHERE rank <= 10 ORDER BY query_id, rank"""

  /** Product quantization: per-subspace exact-mean codebooks, max-sub-
    * cosine encode, ADC table-sum scan (exact decimal sums), exact
    * rerank — every step of vector/Similarity.pqTopK mirrored. */
  private val knnPqOracleSql: String = {
    def cosSql(n: Int, a: String, b: String): String =
      s"""(list_sum(list_transform(range(1, ${n + 1}), j -> $a[j] * $b[j]))
            / (sqrt(list_sum(list_transform(range(1, ${n + 1}), j -> $a[j] * $a[j])))
               * sqrt(list_sum(list_transform(range(1, ${n + 1}), j -> $b[j] * $b[j])))))"""
    s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
         subs AS (SELECT vec_id, label, CAST(s AS INTEGER) AS sub,
            e[s * 8 + 1 : s * 8 + 8] AS sv
           FROM v, (SELECT unnest(range(8)) AS s)),
         dims AS (SELECT sub, label, CAST(unnest(range(8)) AS INTEGER) AS pos,
            unnest(sv) AS x FROM subs),
         cent AS (SELECT sub, label, pos,
            CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS mc
           FROM dims GROUP BY sub, label, pos),
         cb AS (SELECT sub, label AS code, list(mc ORDER BY pos) AS c
           FROM cent GROUP BY sub, label),
         codes AS (SELECT vec_id, sub, code FROM (
            SELECT subs.vec_id, subs.sub, cb.code,
              row_number() OVER (PARTITION BY subs.vec_id, subs.sub
                ORDER BY ${cosSql(8, "sv", "c")} DESC, cb.code) AS r
            FROM subs JOIN cb ON subs.sub = cb.sub) WHERE r = 1),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
         qsubs AS (SELECT query_id, CAST(s AS INTEGER) AS sub,
            qe[s * 8 + 1 : s * 8 + 8] AS qs
           FROM q, (SELECT unnest(range(8)) AS s)),
         parts AS (SELECT query_id, qsubs.sub, code,
            list_sum(list_transform(range(1, 9), j -> qs[j] * c[j])) AS dpart,
            list_sum(list_transform(range(1, 9), j -> c[j] * c[j])) AS n2part
           FROM qsubs JOIN cb ON qsubs.sub = cb.sub),
         qn AS (SELECT query_id,
            sqrt(list_sum(list_transform(range(1, 65), j -> qe[j] * qe[j])))
              AS qn
           FROM q),
         adc AS (SELECT parts.query_id, codes.vec_id,
            CAST(sum(CAST(dpart AS DECIMAL(28,12))) AS DOUBLE) AS adot,
            CAST(sum(CAST(n2part AS DECIMAL(28,12))) AS DOUBLE) AS an2
           FROM codes JOIN parts
             ON codes.sub = parts.sub AND codes.code = parts.code
           GROUP BY parts.query_id, codes.vec_id),
         coarse AS (SELECT query_id, vec_id FROM (
            SELECT adc.query_id, adc.vec_id,
              row_number() OVER (PARTITION BY adc.query_id
                ORDER BY round(adot / (qn.qn * sqrt(an2)), 6) DESC,
                  adc.vec_id) AS crank
            FROM adc JOIN qn ON adc.query_id = qn.query_id
            WHERE adc.vec_id <> adc.query_id) WHERE crank <= 100),
         ex AS (SELECT coarse.query_id, coarse.vec_id,
            round(${cosSql(64, "qe", "e")}, 6) AS cos
           FROM coarse JOIN v ON coarse.vec_id = v.vec_id
           JOIN q ON coarse.query_id = q.query_id),
         r2 AS (SELECT query_id, vec_id, cos,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS INTEGER) AS rank FROM ex)
         SELECT query_id, rank, vec_id, round(cos, 3) AS cos
         FROM r2 WHERE rank <= 10 ORDER BY query_id, rank"""
  }

  /** Exact quadratic shingle-Jaccard self-join at `threshold` — the
    * shared oracle for q_jaccard_pairs and both jaccardPrefixPairs
    * variants (prefix filtering is lossless, so the sub-quadratic
    * plans must match this all-pairs form bit-for-bit). */
  private def jaccardAllPairsOracleSql(threshold: Double,
      where: String = ""): String =
    s"""WITH tok AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents
           $where),
         sh AS (
           SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(len(w) - 2),
                 i -> array_to_string(w[i+1:i+3], ' ')) END) AS shingle
           FROM tok),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b, n_common,
            CAST(n_common AS DOUBLE)
              / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
         FROM pairs
         JOIN sizes sa ON doc_a = sa.doc_id
         JOIN sizes sb ON doc_b = sb.doc_id
         WHERE CAST(n_common AS DOUBLE)
              / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= $threshold
         ORDER BY doc_a, doc_b"""

  /** IVF + one Lloyd refinement: re-assign to nearest seed, exact-mean
    * the new clusters, probe the refined index. */
  private val ivfRefinedOracleSql: String = {
    def cosSql(a: String, b: String): String =
      s"""list_sum(list_transform(range(1, 65), j -> $a[j] * $b[j]))
            / (sqrt(list_sum(list_transform(range(1, 65), j -> $a[j] * $a[j])))
               * sqrt(list_sum(list_transform(range(1, 65), j -> $b[j] * $b[j]))))"""
    s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
         dims AS (SELECT label, CAST(unnest(range(64)) AS INTEGER) AS pos,
            unnest(e) AS x FROM v),
         cent AS (SELECT label, pos,
            CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS m
           FROM dims GROUP BY label, pos),
         seed AS (SELECT label, list(m ORDER BY pos) AS c
           FROM cent GROUP BY label),
         asg AS (SELECT vec_id, e, cluster FROM (
            SELECT v.vec_id, v.e, seed.label AS cluster,
              row_number() OVER (PARTITION BY v.vec_id ORDER BY
                ${cosSql("e", "c")} DESC, seed.label) AS r
            FROM v CROSS JOIN seed) WHERE r = 1),
         rdims AS (SELECT cluster, CAST(unnest(range(64)) AS INTEGER) AS pos,
            unnest(e) AS x FROM asg),
         rcent AS (SELECT cluster, pos,
            CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS m
           FROM rdims GROUP BY cluster, pos),
         rvec AS (SELECT cluster, list(m ORDER BY pos) AS c
           FROM rcent GROUP BY cluster),
         q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
         probe AS (SELECT query_id, qe, cluster AS probe_cluster FROM (
            SELECT q.query_id, q.qe, rvec.cluster,
              row_number() OVER (PARTITION BY q.query_id ORDER BY
                ${cosSql("qe", "c")} DESC, rvec.cluster) AS r
            FROM q CROSS JOIN rvec) WHERE r = 1),
         c2 AS (SELECT query_id, asg.vec_id,
            round(${cosSql("qe", "e")}, 6) AS cos
           FROM asg JOIN probe
             ON asg.cluster = probe.probe_cluster
            AND asg.vec_id <> probe.query_id),
         r2 AS (SELECT query_id, vec_id, cos,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS INTEGER) AS rank FROM c2)
         SELECT query_id, rank, vec_id, round(cos, 3) AS cos
         FROM r2 WHERE rank <= 10 ORDER BY query_id, rank"""
  }

  /** DuckDB SQL reproducing the SRP-LSH top-k exactly: the hyperplane
    * constants come from the same generator as Similarity.srpBucket, and
    * both engines fold the dot products sequentially in double, so bucket
    * assignments (and therefore candidates and ranking) are identical. */
  private def lshOracleSql(bits: Int, nQueries: Int, k: Int): String = {
    val planes = graft.vector.Similarity.srpPlanes(bits)
    val planeDefs = planes.zipWithIndex.map { case (p, i) =>
      s"[${p.mkString(", ")}]::DOUBLE[] AS p$i"
    }.mkString(", ")
    val bucketExpr = (0 until bits).map { i =>
      s"(CASE WHEN list_sum(list_transform(range(1, 65), j -> e[j] * p$i[j])) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH pl AS (SELECT $planeDefs),
       v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       b AS (SELECT vec_id, e, $bucketExpr AS bucket FROM v, pl),
       q AS (SELECT vec_id AS query_id, e AS qe, bucket AS qbucket
             FROM b WHERE vec_id < $nQueries),
       c AS (SELECT query_id, b.vec_id,
             round(list_sum(list_transform(range(1, 65), j -> qe[j] * e[j]))
               / (sqrt(list_sum(list_transform(range(1, 65), j -> qe[j] * qe[j])))
                  * sqrt(list_sum(list_transform(range(1, 65), j -> e[j] * e[j])))),
               6) AS cos
            FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.query_id),
       r AS (SELECT query_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS INTEGER) AS rank FROM c)
       SELECT query_id, rank, vec_id, round(cos, 3) AS cos
       FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** Shared bucket CTE fragment for SRP-based oracles. */
  private def srpCte(bits: Int): String = {
    val planes = graft.vector.Similarity.srpPlanes(bits)
    val planeDefs = planes.zipWithIndex.map { case (p, i) =>
      s"[${p.mkString(", ")}]::DOUBLE[] AS p$i"
    }.mkString(", ")
    val bucketExpr = (0 until bits).map { i =>
      s"(CASE WHEN list_sum(list_transform(range(1, 65), j -> e[j] * p$i[j])) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH pl AS (SELECT $planeDefs),
       v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       b AS (SELECT vec_id, e, $bucketExpr AS bucket FROM v, pl)"""
  }

  private val cosSql =
    """round(list_sum(list_transform(range(1, 65), j -> qe[j] * e[j]))
         / (sqrt(list_sum(list_transform(range(1, 65), j -> qe[j] * qe[j])))
            * sqrt(list_sum(list_transform(range(1, 65), j -> e[j] * e[j])))),
         6)"""

  /** Multi-probe variant: candidates from the exact bucket plus every
    * Hamming-1 neighbor (xor with each power of two). */
  private def lshMultiProbeOracleSql(bits: Int, nQueries: Int, k: Int): String = {
    val probes = ("q.qbucket" +: (0 until bits).map(i =>
      s"xor(q.qbucket, ${1L << i})")).mkString(", ")
    s"""${srpCte(bits)},
       q AS (SELECT vec_id AS query_id, e AS qe, bucket AS qbucket
             FROM b WHERE vec_id < $nQueries),
       c AS (SELECT query_id, b.vec_id, $cosSql AS cos
            FROM b JOIN q ON b.bucket IN ($probes) AND b.vec_id <> q.query_id),
       r AS (SELECT query_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS INTEGER) AS rank FROM c)
       SELECT query_id, rank, vec_id, round(cos, 3) AS cos
       FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** Cosine near-dup pairs within SRP buckets (unrounded threshold filter,
    * rounded output — matches Similarity.cosineNearDupPairs). */
  private def cosineNearDupOracleSql(bits: Int, threshold: Double): String =
    s"""${srpCte(bits)}
       SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
          round(list_sum(list_transform(range(1, 65), j -> a.e[j] * b2.e[j]))
            / (sqrt(list_sum(list_transform(range(1, 65), j -> a.e[j] * a.e[j])))
               * sqrt(list_sum(list_transform(range(1, 65), j -> b2.e[j] * b2.e[j])))),
            3) AS cos
       FROM b a JOIN b b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE list_sum(list_transform(range(1, 65), j -> a.e[j] * b2.e[j]))
            / (sqrt(list_sum(list_transform(range(1, 65), j -> a.e[j] * a.e[j])))
               * sqrt(list_sum(list_transform(range(1, 65), j -> b2.e[j] * b2.e[j]))))
            >= $threshold
       ORDER BY id_a, id_b"""

  /** SemDeDup oracle: same per-label exact-mean centroids as the IVF
    * oracle, nearest-centroid assignment, within-cluster pairs under
    * the same size-derived sub-blocking hash, lowest-id keeper per
    * duplicate (unrounded threshold filter, rounded output — matches
    * Similarity.semDedup; at fixture SFs every cluster fits one block
    * so the blocking is the identity, but the arithmetic is mirrored
    * so the compare would stay exact on any corpus). */
  private def semDedupOracleSql(threshold: Double, blockCap: Int = 512)
      : String = {
    def cos(a: String, b: String): String =
      s"""list_sum(list_transform(range(1, 65), j -> $a[j] * $b[j]))
          / (sqrt(list_sum(list_transform(range(1, 65), j -> $a[j] * $a[j])))
             * sqrt(list_sum(list_transform(range(1, 65), j -> $b[j] * $b[j]))))"""
    s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
         dims AS (SELECT label, CAST(unnest(range(64)) AS INTEGER) AS pos,
            unnest(e) AS x FROM v),
         cent AS (SELECT label, pos,
            CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS m
           FROM dims GROUP BY label, pos),
         cvec AS (SELECT label, list(m ORDER BY pos) AS c
           FROM cent GROUP BY label),
         assign AS (SELECT vec_id, e, label AS cluster FROM (
            SELECT v.vec_id, v.e, cvec.label,
              row_number() OVER (PARTITION BY v.vec_id ORDER BY
                ${cos("e", "c")} DESC, cvec.label) AS r
            FROM v CROSS JOIN cvec) WHERE r = 1),
         sizes AS (SELECT cluster, count(*) AS csz
           FROM assign GROUP BY cluster),
         blocked AS (SELECT assign.*,
              (((vec_id % 2147483648) * 2654435761) % 4294967296)
                % ((csz + ${blockCap - 1}) // $blockCap) AS blk
           FROM assign JOIN sizes USING (cluster)),
         p AS (SELECT b.vec_id AS dup_id, a.vec_id AS kept_id,
              a.cluster, ${cos("a.e", "b.e")} AS cos
           FROM blocked a JOIN blocked b
             ON a.cluster = b.cluster AND a.blk = b.blk
               AND a.vec_id < b.vec_id
           WHERE ${cos("a.e", "b.e")} >= $threshold),
         k AS (SELECT dup_id, kept_id, cluster, cos,
              row_number() OVER (PARTITION BY dup_id ORDER BY kept_id)
                AS rn
           FROM p)
       SELECT dup_id, kept_id, cluster, round(cos, 3) AS cos
       FROM k WHERE rn = 1 ORDER BY dup_id"""
  }

  /** The near-dup pair graph -> connected-components closure shared by
    * the q_dedup_clusters / q_split_leakage / q_cluster_canonical /
    * q_dedup_weights oracles: word-3-gram shingles, Jaccard >= 0.5
    * pairs, both edge directions, recursive transitive closure,
    * min-reachable-id label. Ends in lab(doc_id, cluster_id) — member
    * (edge-connected) docs only; each oracle handles singletons its
    * own way. */
  private val nearDupClusterCtes: String =
    """tok AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (
           SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(len(w) - 2),
                 i -> array_to_string(w[i+1:i+3], ' ')) END) AS shingle
           FROM tok),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         cnt AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         jp AS (
           SELECT doc_a, doc_b FROM cnt
           JOIN sizes sa ON doc_a = sa.doc_id
           JOIN sizes sb ON doc_b = sb.doc_id
           WHERE CAST(n_common AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5),
         edges AS (
           SELECT doc_a AS src, doc_b AS dst FROM jp
           UNION SELECT doc_b, doc_a FROM jp),
         reach(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         lab AS (
           SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
           FROM reach GROUP BY src)"""

  /** Domain-assignment oracle: the semDedup assignment CTEs with the
    * centroid label exposed as `domain` and the self-assignment flag. */
  private def domainAssignOracleSql: String = {
    def cos(a: String, b: String): String =
      s"""list_sum(list_transform(range(1, 65), j -> $a[j] * $b[j]))
          / (sqrt(list_sum(list_transform(range(1, 65), j -> $a[j] * $a[j])))
             * sqrt(list_sum(list_transform(range(1, 65), j -> $b[j] * $b[j]))))"""
    s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
         dims AS (SELECT label, CAST(unnest(range(64)) AS INTEGER) AS pos,
            unnest(e) AS x FROM v),
         cent AS (SELECT label, pos,
            CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS m
           FROM dims GROUP BY label, pos),
         cvec AS (SELECT label AS domain, list(m ORDER BY pos) AS c
           FROM cent GROUP BY label)
       SELECT vec_id, label, domain, round(scos, 6) AS cos,
         domain = label AS is_home
       FROM (
         SELECT v.vec_id, v.label, cvec.domain,
           ${cos("e", "c")} AS scos,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             ${cos("e", "c")} DESC, cvec.domain) AS r
         FROM v CROSS JOIN cvec)
       WHERE r = 1 ORDER BY vec_id"""
  }

  private val decSumQty = Cols.sqlDecSum("l_quantity", 2)
  private val revenueExpr =
    "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)"

  def oracleSql: Map[String, String] = Map(
    "q_hist_range" ->
      """SELECT event_id, ts AS timestamp, user_id, event_type, value
         FROM events
         WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOURS
         ORDER BY timestamp, event_id""",
    "q_hist_range_7d" ->
      """SELECT event_id, ts AS timestamp, user_id, event_type, value
         FROM events
         WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 168 HOURS
         ORDER BY timestamp, event_id""",
    "q_hist_summary" ->
      s"""SELECT count(value) AS n_records,
            ${Cols.sqlDecAvg("value")} AS avg_value,
            max(value) AS max_value, min(value) AS min_value,
            min(ts) AS first_ts, max(ts) AS last_ts
          FROM events
          WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOURS""",
    "q_required_counts" ->
      """SELECT event_type, count(*) AS n FROM events
         WHERE ts IS NOT NULL AND user_id IS NOT NULL
           AND value IS NOT NULL AND event_type IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",
    "q_rename_tag" ->
      """SELECT event_id, ts AS timestamp, user_id, value AS value,
            'value' AS metric_type
         FROM events ORDER BY event_id""",
    "q_latest_record" ->
      "SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 1",
    "q_time_buckets" ->
      s"""WITH a AS (SELECT max(ts) AS anchor FROM events)
          SELECT CASE
              WHEN date_diff('second', ts, anchor) <= 3600 THEN '1h'
              WHEN date_diff('second', ts, anchor) <= 86400 THEN '24h'
              WHEN date_diff('second', ts, anchor) <= 604800 THEN '7d'
              WHEN date_diff('second', ts, anchor) <= 2592000 THEN '30d'
              ELSE 'older' END AS bucket,
            count(*) AS n, ${Cols.sqlDecAvg("value")} AS avg_value
          FROM events, a GROUP BY bucket ORDER BY bucket""",
    "q_grouped_series" ->
      s"""SELECT user_id, event_type, count(*) AS n,
            ${Cols.sqlDecAvg("value")} AS avg_value,
            min(value) AS min_value, max(value) AS max_value
          FROM events GROUP BY user_id, event_type
          ORDER BY user_id, event_type""",
    "q_labels" ->
      """SELECT event_id,
            strftime(ts, '%Y-%m-%d %H:%M') AS ts_label,
            upper(left(replace(event_type, '_', ' '), 1)) ||
              substr(replace(event_type, '_', ' '), 2) AS series_label,
            round(value, 1) AS value_rounded
         FROM events WHERE event_id < 100 ORDER BY event_id""",
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
            CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
            CAST(sum(CAST(json_extract_string(props, '$.k') AS DECIMAL(28,0))) AS DOUBLE)
              / CAST(count(json_extract_string(props, '$.k')) AS DOUBLE) AS avg_k
         FROM events
         WHERE json_extract_string(props, '$.k') IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",
    "q_variant_extract" ->
      """SELECT event_type,
            count(json_extract_string(props, '$.k')) AS n,
            CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
            min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
            max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
         FROM events
         GROUP BY event_type
         HAVING count(json_extract_string(props, '$.k')) > 0
         ORDER BY event_type""",
    "q_upsert_latest" ->
      """SELECT user_id, ts, event_id, event_type, value FROM (
           SELECT user_id, ts, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
    "q_trailing_1h" ->
      """SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(28,6))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS trailing_sum
         FROM events ORDER BY user_id, event_id""",
    "q_table_diff" ->
      """WITH o AS (
           SELECT event_id, event_type, value FROM events
           WHERE event_id % 20 <> 19),
         n AS (
           SELECT event_id, event_type,
             CASE WHEN event_id % 10 = 5 THEN value + 1.0 ELSE value END
               AS value
           FROM events WHERE event_id % 20 <> 0),
         d AS (
           SELECT coalesce(o.event_id, n.event_id) AS event_id,
             CASE WHEN o.event_id IS NULL THEN 'added'
                  WHEN n.event_id IS NULL THEN 'removed'
                  WHEN o.event_type = n.event_type AND o.value = n.value
                    THEN 'unchanged'
                  ELSE 'changed' END AS status
           FROM o FULL OUTER JOIN n ON o.event_id = n.event_id)
         SELECT status, count(*) AS n,
           min(event_id) AS min_id, max(event_id) AS max_id
         FROM d GROUP BY status ORDER BY status""",
    // merged-partials == flat recompute (the incremental-maintenance
    // correctness property) — the oracle IS the flat recompute.
    "q_incr_agg" ->
      s"""SELECT event_type, count(*) AS n,
            ${Cols.sqlDecSum("value")} AS sum_value,
            min(value) AS min_value, max(value) AS max_value
          FROM events GROUP BY 1 ORDER BY 1""",
    "q_scd2" ->
      """SELECT user_id, event_id, event_type, ts AS valid_from,
           lead(ts, 1) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS valid_to,
           lead(ts, 1) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) IS NULL AS is_current
         FROM events ORDER BY user_id, valid_from, event_id""",
    "q_range_bands" -> E.rangeBandCountsOracleSql,
    "q_range_bands_keyed" -> E.keyedRangeBandCountsOracleSql,
    "q_scd2_lookup" -> E.scd2RateLookupOracleSql,
    "q_overlap_join" -> E.sessionOverlapWindowsOracleSql,
    // the binned-fallback twins are EXACT plan alternatives, so the
    // same oracles pin them — a fallback bug shows as a hash mismatch
    // on the _binned row while the broadcast row stays green
    "q_range_bands_binned" -> E.rangeBandCountsOracleSql,
    "q_scd2_lookup_binned" -> E.scd2RateLookupOracleSql,
    "q_overlap_join_binned" -> E.sessionOverlapWindowsOracleSql,
    "q_cdc_apply" ->
      """WITH c AS (
           SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rk
           FROM events)
         SELECT user_id, op AS last_op, ts AS last_ts, value AS last_value
         FROM c WHERE rk = 1 AND op <> 'D' ORDER BY user_id""",
    "q_ewma" -> E.ewmaOracleSql(),
    "q_skyline" -> operators.Extended.skylinePartsOracleSql(),
    "q_transitions" ->
      """WITH s AS (
           SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
           FROM events),
         c AS (
           SELECT prev_type, event_type, count(*) AS n_trans
           FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         SELECT prev_type, event_type, n_trans,
           CAST(n_trans AS DOUBLE)
             / CAST(sum(n_trans) OVER (PARTITION BY prev_type)
               AS DOUBLE) AS p_trans
         FROM c ORDER BY prev_type, event_type""",
    // nearest-rank winsorize: bounds are ACTUAL data values (rank
    // ceil(p*n)), so they are bit-exact across engines; the clipped mean
    // sums exact decimals (same cast as Spark's decimal(28,6)).
    "q_winsorized" ->
      """WITH ranked AS (
           SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events),
         bounds AS (
           SELECT event_type, min(value) AS lo, max(value) AS hi
           FROM ranked
           WHERE rk = ceil(n * 0.05) OR rk = ceil(n * 0.95)
           GROUP BY event_type)
         SELECT e.event_type,
           count(*) AS n,
           min(b.lo) AS p05,
           min(b.hi) AS p95,
           CAST(sum(CAST(least(greatest(e.value, b.lo), b.hi)
             AS DECIMAL(28,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS winsorized_mean
         FROM events e JOIN bounds b USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",
    "q_interval_join" ->
      """SELECT v.event_id AS view_id, v.user_id, v.ts AS view_ts,
            p.event_id AS purchase_id, p.ts AS purchase_ts
         FROM events v JOIN events p
           ON v.user_id = p.user_id
          AND v.event_type = 'view' AND p.event_type = 'purchase'
          AND p.ts <= v.ts AND p.ts >= v.ts - INTERVAL 1 HOUR
         ORDER BY view_id, purchase_id""",
    "q_parse_or_drop" ->
      """SELECT event_id, parsed FROM (
           SELECT event_id,
             try_strptime(CASE WHEN event_id % 10 = 0 THEN 'not-a-timestamp'
               ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END,
               '%Y-%m-%d %H:%M:%S') AS parsed
           FROM events) WHERE parsed IS NOT NULL ORDER BY event_id""",
    "q_corrupt_records" ->
      """WITH pay AS (
           SELECT CASE
               WHEN event_id % 10 = 0 THEN substring(props, 1, length(props) - 1)
               WHEN event_id % 10 = 1 THEN '{"k": "s' || event_id || '"}'
               WHEN event_id % 10 = 2 THEN '{}'
               WHEN event_id % 10 = 3 THEN NULL
               ELSE props END AS payload
           FROM events),
         ext AS (
           -- json_extract* may throw on malformed text even under a CASE
           -- guard (vectorized evaluation), so extraction only ever sees
           -- sanitized input: malformed payloads are swapped for '{}'.
           SELECT payload,
             payload IS NOT NULL AND json_valid(payload) AS ok,
             json_extract_string(CASE WHEN payload IS NOT NULL
                 AND json_valid(payload) THEN payload ELSE '{}' END,
               '$.k') AS kstr
           FROM pay),
         cls AS (
           SELECT payload,
             CASE
               WHEN payload IS NULL THEN 'null_payload'
               WHEN NOT ok THEN 'malformed_json'
               WHEN kstr IS NULL THEN 'missing_field'
               WHEN try_cast(kstr AS INTEGER) IS NULL THEN 'wrong_type'
               ELSE 'valid' END AS failure_class,
             -- PERMISSIVE capture contract: malformed text and
             -- type-conversion failures land in _corrupt_record; a
             -- merely-missing field does not.
             CASE
               WHEN payload IS NULL THEN NULL
               WHEN NOT ok OR (kstr IS NOT NULL
                 AND try_cast(kstr AS INTEGER) IS NULL)
               THEN payload END AS captured
           FROM ext)
         SELECT failure_class,
           count(*) AS n,
           CAST(count(captured) AS BIGINT) AS n_captured,
           min(captured) AS sample_reject
         FROM cls GROUP BY 1 ORDER BY 1""",
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(ts) AS t2 FROM events e
            JOIN v ON e.user_id = v.user_id
            WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(ts) AS t3 FROM events e
            JOIN c ON e.user_id = c.user_id
            WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
         SELECT 1 AS step_idx, 'view' AS step, count(*) AS n_users FROM v
         UNION ALL
         SELECT 2, 'view>click', count(*) FROM c
         UNION ALL
         SELECT 3, 'view>click>purchase', count(*) FROM p
         ORDER BY step_idx""",
    "q_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
            CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
              AS INTEGER) AS week
           FROM events),
         c AS (SELECT user_id, min(week) AS cohort_week FROM uw
           GROUP BY user_id)
         SELECT cohort_week, week - cohort_week AS week_offset,
            count(DISTINCT uw.user_id) AS n_users
         FROM uw JOIN c ON uw.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_interarrival" ->
      """SELECT user_id, event_id, gap_us FROM (
           SELECT user_id, event_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
           FROM events) WHERE gap_us IS NOT NULL
         ORDER BY user_id, event_id""",
    "q_running_sum" ->
      """SELECT user_id, event_id,
            CAST(sum(CAST(value AS DECIMAL(28,6))) OVER
              (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              AS running_value
         FROM events ORDER BY user_id, event_id""",
    "q_sessionize" ->
      """WITH x AS (
           SELECT user_id, ts, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         y AS (
           SELECT user_id, ts, event_id,
             CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
               THEN 1 ELSE 0 END AS new_session
           FROM x),
         z AS (
           SELECT user_id, ts, event_id,
             CAST(sum(new_session) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM y)
         SELECT user_id, session_id, count(*) AS n_events,
            min(ts) AS session_start, max(ts) AS session_end
         FROM z GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    // native session_window boundary: a gap of EXACTLY 30 min starts a
    // new session (window overlap is strict), hence >= where
    // q_sessionize's manual form uses >
    "q_session_window" ->
      sessionWindowOracleSql(validated = false, withLastTs = true),
    "q_neg_sample" -> operators.Pipeline.negativeSamplesOracleSql(),
    "q_asof_purchase" ->
      """SELECT e.event_id, e.ts, e.user_id,
            (SELECT max(p.ts) FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
               AND (p.ts < e.ts OR (p.ts = e.ts AND p.event_id <= e.event_id)))
              AS last_purchase_ts
         FROM events e WHERE e.event_type = 'view' ORDER BY e.event_id""",
    "q_asof_custom" ->
      """SELECT e.event_id, e.ts, e.user_id,
            (SELECT max(p.ts) FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
               AND (p.ts < e.ts OR (p.ts = e.ts AND p.event_id <= e.event_id)))
              AS last_purchase_ts
         FROM events e WHERE e.event_type = 'view' ORDER BY e.event_id""",
    // nearest: the global min-|delta| purchase ts is achieved by either
    // the backward-best or forward-best; equal distance -> backward
    // (the CASE orders the at-or-before side first)
    "q_asof_nearest" ->
      """SELECT e.event_id, e.ts, e.user_id,
            (SELECT p.ts FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
             ORDER BY abs(epoch_us(p.ts) - epoch_us(e.ts)),
               CASE WHEN p.ts < e.ts
                 OR (p.ts = e.ts AND p.event_id <= e.event_id)
                 THEN 0 ELSE 1 END,
               p.ts, p.event_id
             LIMIT 1) AS nearest_purchase_ts
         FROM events e WHERE e.event_type = 'view' ORDER BY e.event_id""",
    // forward: min ts of the lexicographically-at-or-after purchases —
    // ts leads the (ts, event_id) order, so min(ts) IS the first row's ts
    "q_asof_forward" ->
      """SELECT e.event_id, e.ts, e.user_id,
            (SELECT min(p.ts) FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
               AND (p.ts > e.ts OR (p.ts = e.ts AND p.event_id >= e.event_id)))
              AS next_purchase_ts
         FROM events e WHERE e.event_type = 'view' ORDER BY e.event_id""",
    "q_tumbling_hourly" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
            count(*) AS n, ${Cols.sqlDecSum("value")} AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_dense_series" ->
      s"""WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
              date_trunc('hour', max(ts)) AS hi FROM events),
          spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
              AS hour FROM b),
          c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
              ${Cols.sqlDecSum("value")} AS sum_value
            FROM events GROUP BY 1)
          SELECT spine.hour, coalesce(n, 0) AS n,
            coalesce(sum_value, 0.0) AS sum_value
          FROM spine LEFT JOIN c USING (hour) ORDER BY spine.hour""",
    "q_interpolate" ->
      """WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
              date_trunc('hour', max(ts)) AS hi FROM events),
          hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
              AS hour FROM b),
          spine AS (SELECT event_type, hour
            FROM (SELECT DISTINCT event_type FROM events) CROSS JOIN hours),
          o AS (SELECT event_type, date_trunc('hour', ts) AS hour,
              count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) AS mv
            FROM events GROUP BY 1, 2),
          j AS (SELECT s.event_type, s.hour, o.n, o.mv,
              CAST(epoch(s.hour) AS DOUBLE) AS hr
            FROM spine s LEFT JOIN o USING (event_type, hour)),
          w AS (SELECT *,
              last_value(mv IGNORE NULLS) OVER pw AS pv,
              last_value(CASE WHEN mv IS NOT NULL THEN hr END IGNORE NULLS)
                OVER pw AS ph,
              first_value(mv IGNORE NULLS) OVER nw AS nv,
              first_value(CASE WHEN mv IS NOT NULL THEN hr END IGNORE NULLS)
                OVER nw AS nh
            FROM j
            WINDOW pw AS (PARTITION BY event_type ORDER BY hour
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            nw AS (PARTITION BY event_type ORDER BY hour
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
          SELECT event_type, hour, coalesce(n, 0) AS n,
            CASE WHEN n IS NOT NULL THEN mv
                 WHEN pv IS NOT NULL AND nv IS NOT NULL
                   THEN pv + (nv - pv) * (hr - ph) / (nh - ph)
                 ELSE coalesce(pv, nv) END AS value_filled,
            CASE WHEN n IS NOT NULL THEN 'observed'
                 WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interpolated'
                 ELSE 'edge' END AS fill
          FROM w ORDER BY event_type, hour""",
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
            $decSumQty AS sum_qty,
            ${Cols.sqlDecSum("l_extendedprice", 2)} AS sum_base_price,
            $revenueExpr AS sum_disc_price,
            CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
              AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
            ${Cols.sqlDecAvg("l_quantity", 2)} AS avg_qty,
            ${Cols.sqlDecAvg("l_extendedprice", 2)} AS avg_price,
            ${Cols.sqlDecAvg("l_discount", 2)} AS avg_disc,
            count(*) AS count_order
          FROM lineitem GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""",
    "q_join_priority" ->
      s"""SELECT o_orderpriority, $revenueExpr AS revenue, count(*) AS n_lines
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_join_segment" ->
      s"""SELECT c_mktsegment,
            ${Cols.sqlDecSum("o_totalprice", 2)} AS total_revenue,
            count(*) AS n_orders,
            count(DISTINCT o_custkey) AS n_customers
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_regional_revenue" ->
      s"""SELECT r_name, n_name, $revenueExpr AS revenue, count(*) AS n_lines
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_ratio_to_report" ->
      s"""WITH base AS (
           SELECT r_name, n_name, $revenueExpr AS revenue,
             count(*) AS n_lines
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name, n_name)
         SELECT r_name, n_name, revenue, n_lines,
           CAST(sum(CAST(revenue AS DECIMAL(28,4)))
             OVER (PARTITION BY r_name) AS DOUBLE) AS region_revenue,
           revenue / CAST(sum(CAST(revenue AS DECIMAL(28,4)))
             OVER (PARTITION BY r_name) AS DOUBLE) AS region_share
         FROM base ORDER BY r_name, n_name""",
    "q_benford" -> operators.Extended.benfordDigitsOracleSql(),
    "q_bitmap_distinct" ->
      operators.Extended.bitmapDistinctUsersOracleSql(),
    "q_outer_join" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
            coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE),
              0.0) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey""",
    "q_theta_join" ->
      """SELECT s_suppkey, s_name, count(*) AS n_richer_customers
         FROM customer JOIN supplier ON s_acctbal < c_acctbal
         GROUP BY s_suppkey, s_name ORDER BY s_suppkey""",
    "q_theta_hist" ->
      """SELECT s_suppkey, s_name, count(*) AS n_richer_customers
         FROM customer JOIN supplier ON s_acctbal < c_acctbal
         GROUP BY s_suppkey, s_name ORDER BY s_suppkey""",
    "q_strict_rank" ->
      """SELECT c_custkey, c_acctbal,
            CAST((SELECT count(*) FROM supplier
                  WHERE s_acctbal < c.c_acctbal) AS BIGINT)
              AS n_poorer_suppliers
         FROM customer c ORDER BY c_custkey""",
    "q_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",
    "q_window_top3" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
           FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q_zorder" ->
      s"""SELECT o_orderkey,
            ${graft.functions.ZValue.zvalueSql("o_custkey",
              "date_diff('day', DATE '1970-01-01', o_orderdate::DATE)")} AS zval
          FROM orders ORDER BY zval, o_orderkey LIMIT 1000""",
    "q_hilbert" ->
      s"""WITH RECURSIVE pts AS (
            SELECT o_orderkey AS key, o_custkey AS x,
              date_diff('day', DATE '1970-01-01', o_orderdate::DATE) AS y
            FROM orders),
          ${graft.functions.HilbertValue.hilbertCteSql("pts")}
          SELECT key AS o_orderkey, hval FROM _hilbert
          ORDER BY hval, o_orderkey LIMIT 1000""",
    "q_zorder_range" -> {
      import graft.functions.ZValue
      s"""SELECT o_orderkey, o_custkey,
            date_diff('day', DATE '1970-01-01', o_orderdate::DATE) AS day,
            ${ZValue.zvalueSql("o_custkey",
              "date_diff('day', DATE '1970-01-01', o_orderdate::DATE)")}
              AS zval
          FROM orders
          WHERE ${ZValue.zvalueSql("o_custkey",
              "date_diff('day', DATE '1970-01-01', o_orderdate::DATE)")}
              BETWEEN ${ZValue.interleave(40L, 9500L)}
                  AND ${ZValue.interleave(90L, 10000L)}
            AND o_custkey BETWEEN 40 AND 90
            AND date_diff('day', DATE '1970-01-01', o_orderdate::DATE)
              BETWEEN 9500 AND 10000
          ORDER BY o_orderkey"""
    },
    "q_hilbert_range" -> {
      // same driver-side box decomposition constants as the Spark side
      // (embedded-constant oracle, like the LSH hyperplanes)
      val ranges = graft.functions.HilbertValue
        .boxRanges(40L, 90L, 9500L, 10000L)
        .map { case (lo, hi) => s"(h.hval BETWEEN $lo AND $hi)" }
        .mkString(" OR ")
      s"""WITH RECURSIVE pts AS (
            SELECT o_orderkey AS key, o_custkey AS x,
              date_diff('day', DATE '1970-01-01', o_orderdate::DATE) AS y
            FROM orders),
          ${graft.functions.HilbertValue.hilbertCteSql("pts")}
          SELECT o.o_orderkey, o.o_custkey,
            date_diff('day', DATE '1970-01-01', o.o_orderdate::DATE) AS day,
            h.hval
          FROM orders o JOIN _hilbert h ON h.key = o.o_orderkey
          WHERE ($ranges)
            AND o.o_custkey BETWEEN 40 AND 90
            AND date_diff('day', DATE '1970-01-01', o.o_orderdate::DATE)
              BETWEEN 9500 AND 10000
          ORDER BY o.o_orderkey"""
    },
    "q_topk_custom" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_custkey, o_totalprice DESC, o_orderkey""",
    "q_distinct_parts" ->
      """SELECT l_returnflag,
            count(DISTINCT l_partkey) AS n_parts,
            count(DISTINCT l_suppkey) AS n_supps,
            count(*) AS n_lines
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, $decSumQty AS sum_qty,
            count(*) AS n
          FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
          ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q_cube" ->
      s"""SELECT l_returnflag, l_linestatus, $decSumQty AS sum_qty,
            count(*) AS n
          FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
          ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q_union" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
         UNION
         SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 50000
         ORDER BY c_custkey""",
    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
         INTERSECT
         SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 50000
         ORDER BY c_custkey""",
    "q_except" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
         EXCEPT
         SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 50000
         ORDER BY c_custkey""",
    "q_distinct_shapes" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    "q_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
            ${Cols.sqlDecSum("l_quantity", 2)} AS sum_qty, count(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                  (l_returnflag), ())
          ORDER BY l_returnflag ASC NULLS FIRST,
                   l_linestatus ASC NULLS FIRST""",
    "q_percentile" ->
      """SELECT l_returnflag,
            quantile_cont(l_quantity, 0.25) AS q1_qty,
            quantile_cont(l_quantity, 0.5) AS median_qty,
            quantile_cont(l_quantity, 0.75) AS q3_qty,
            quantile_cont(l_extendedprice, 0.5) AS median_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_math_fns" ->
      """SELECT l_orderkey, l_linenumber,
            abs(l_discount - 0.05) AS abs_disc,
            round(l_extendedprice, 1) AS rounded_price,
            pow(l_quantity, 2) AS qty_squared,
            sqrt(l_extendedprice) AS sqrt_price,
            round(ln(l_extendedprice), 6) AS ln_price,
            greatest(l_tax, l_discount) AS max_rate,
            least(l_tax, l_discount) AS min_rate
         FROM lineitem WHERE l_orderkey < 100
         ORDER BY l_orderkey, l_linenumber""",
    "q_array_ops" ->
      """SELECT vec_id,
            CAST(len(embedding) AS INTEGER) AS dim,
            CAST(embedding[1] AS DOUBLE) AS first_elem,
            CAST(list_min(embedding) AS DOUBLE) AS min_elem,
            CAST(list_max(embedding) AS DOUBLE) AS max_elem,
            CAST(list_sort(embedding)[1] AS DOUBLE) AS sorted_first,
            CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
              AS INTEGER) AS n_positive
         FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""",
    "q_json_roundtrip" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
         ORDER BY event_id""",
    "q_map_fns" ->
      """WITH base AS (
           SELECT event_id, event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS kv,
             CAST(event_id % 100 AS INTEGER) AS tv
           FROM events WHERE event_id < 500),
         m AS (
           SELECT event_id, event_type, kv, tv,
             list_sort(list_distinct(['k', event_type])) AS keys
           FROM base)
         SELECT event_id,
           CAST(len(keys) AS INTEGER) AS n_entries,
           array_to_string(keys, ',') AS keys_csv,
           array_to_string(list_transform(keys,
             x -> CAST(CASE WHEN x = 'k' THEN kv ELSE tv END AS VARCHAR)),
             ',') AS vals_csv,
           CAST(kv AS BIGINT) AS k_val,
           CAST(tv AS BIGINT) AS type_val
         FROM m ORDER BY event_id""",
    "q_salted_agg" ->
      s"""SELECT event_type, count(*) AS n,
            ${Cols.sqlDecSum("value")} AS sum_value
          FROM events GROUP BY event_type ORDER BY event_type""",
    "q_salted_join" ->
      s"""SELECT o_orderpriority, $revenueExpr AS revenue, count(*) AS n_lines
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_skew_report" -> operators.Skew.skewReportOracleSql,
    "q_join_card" ->
      """WITH l AS (SELECT l_orderkey AS k, count(*) AS cl
                    FROM lineitem GROUP BY 1),
         o AS (SELECT o_orderkey AS k, count(*) AS co
               FROM orders GROUP BY 1),
         m AS (SELECT count(*) AS n_matching_keys,
                 CAST(sum(cl * co) AS BIGINT) AS join_rows
               FROM l JOIN o USING (k)),
         ls AS (SELECT CAST(sum(cl) AS BIGINT) AS n_left,
                  count(*) AS n_left_keys FROM l),
         rs AS (SELECT CAST(sum(co) AS BIGINT) AS n_right,
                  count(*) AS n_right_keys FROM o)
         SELECT n_left, n_right, n_left_keys, n_right_keys,
           n_matching_keys, join_rows
         FROM ls, rs, m""",
    "q_top_ngrams" ->
      """WITH tok AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (
           SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(len(w) - 2),
                 i -> array_to_string(w[i+1:i+3], ' ')) END) AS ngram
           FROM tok)
         SELECT ngram, count(*) AS n_docs FROM sh GROUP BY ngram
         ORDER BY n_docs DESC, ngram LIMIT 20""",
    "q_length_histogram" ->
      """SELECT (n_chars // 50) * 50 AS bucket_start, count(*) AS n_docs,
            min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM documents GROUP BY n_chars // 50 ORDER BY bucket_start""",
    "q_dedup_decisions" ->
      """WITH tok AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (
           SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(len(w) - 2),
                 i -> array_to_string(w[i+1:i+3], ' ')) END) AS shingle
           FROM tok),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
           FROM sh a JOIN sh b
             ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         jp AS (
           SELECT doc_a, doc_b FROM pairs
           JOIN sizes sa ON doc_a = sa.doc_id
           JOIN sizes sb ON doc_b = sb.doc_id
           WHERE CAST(n_common AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5),
         dropped AS (
           SELECT doc_b AS doc_id, min(doc_a) AS dup_of FROM jp GROUP BY doc_b)
         SELECT d.doc_id, dropped.dup_of IS NULL AS keep, dropped.dup_of
         FROM documents d LEFT JOIN dropped USING (doc_id)
         ORDER BY d.doc_id""",
    // SQL-surface queries: implementation string IS the oracle string.
    "q_sql_cte" -> operators.SqlSurface.cte,
    "q_sql_scalar_subquery" -> operators.SqlSurface.scalarSubquery,
    "q_sql_correlated" -> operators.SqlSurface.correlatedSubquery,
    "q_sql_in_subquery" -> operators.SqlSurface.inSubquery,
    "q_sql_exists" -> operators.SqlSurface.existsSubquery,
    "q_sql_lateral" -> operators.SqlSurface.lateralJoin,
    "q_sql_custom_fns" -> operators.SqlSurface.customFnsOracleSql,
    "q_recursive_cte" -> operators.SqlSurface.recursiveCte,
    "q_promo_share" ->
      """SELECT date_trunc('month', l_shipdate) AS ship_month,
            CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                THEN l_extendedprice * (1 - l_discount) ELSE 0 END
              AS DECIMAL(28,4))) AS DOUBLE) AS promo_revenue,
            CAST(sum(CAST(l_extendedprice * (1 - l_discount)
              AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue,
            100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                THEN l_extendedprice * (1 - l_discount) ELSE 0 END
              AS DECIMAL(28,4))) AS DOUBLE)
              / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(28,4))) AS DOUBLE) AS promo_pct
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1 ORDER BY ship_month""",
    "q_large_orders" ->
      s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
            total_qty
          FROM (SELECT l_orderkey, ${Cols.sqlDecSum("l_quantity", 2)}
                  AS total_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING total_qty > 200.0) big
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON o_custkey = c_custkey
          ORDER BY total_qty DESC, o_orderkey LIMIT 100""",
    "q_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name, c_acctbal, $revenueExpr
            AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate < TIMESTAMP '1997-04-01'
          GROUP BY c_custkey, c_name, n_name, c_acctbal
          ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount
              AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
            count(*) AS n_lines
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q_min_cost_supplier" ->
      """WITH eur AS (
           SELECT s_suppkey, s_name, s_acctbal, n_name
           FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'),
         offers AS (
           SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
           FROM lineitem GROUP BY 1, 2),
         eo AS (
           SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
             unit_cost
           FROM offers
           JOIN eur ON l_suppkey = s_suppkey
           JOIN part ON l_partkey = p_partkey
           WHERE p_type = 'LARGE'),
         mc AS (
           SELECT p_partkey AS mk, min(unit_cost) AS min_cost
           FROM eo GROUP BY 1)
         SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
         FROM eo JOIN mc ON p_partkey = mk AND unit_cost = min_cost
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         LIMIT 100""",
    "q_product_profit" ->
      """SELECT n_name AS nation,
           CAST(year(l_shipdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
             - 0.5 * p_retailprice * l_quantity AS DECIMAL(28,4)))
             AS DOUBLE) AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%bolt%'
         GROUP BY 1, 2 ORDER BY nation, o_year DESC""",
    "q_important_parts" ->
      """WITH bp AS (
           SELECT l_partkey AS p_partkey,
             CAST(sum(CAST(l_extendedprice * l_quantity
               AS DECIMAL(28,4))) AS DOUBLE) AS value
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'
           GROUP BY 1),
         t AS (
           SELECT CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             / count(*) * 2.0 AS thr
           FROM bp)
         SELECT p_partkey, value FROM bp, t WHERE value > thr
         ORDER BY value DESC, p_partkey""",
    "q_ship_modes" ->
      """SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
         GROUP BY 1 ORDER BY 1""",
    "q_part_supp_counts" ->
      """WITH ab AS (
           SELECT CAST(sum(CAST(s_acctbal AS DECIMAL(28,2)))
             AS DOUBLE) / count(s_acctbal) AS ab
           FROM supplier),
         excl AS (
           SELECT s_suppkey FROM supplier, ab WHERE s_acctbal < ab),
         pairs AS (
           SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         FROM pairs
         JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
           AND l_suppkey NOT IN (SELECT s_suppkey FROM excl)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q_promo_suppliers" ->
      """WITH big AS (
           SELECT l_suppkey
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_name LIKE 'large%'
             AND l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
           GROUP BY 1
           HAVING CAST(sum(CAST(l_quantity AS DECIMAL(28,2)))
             AS DOUBLE) > 100.0)
         SELECT s_name, s_acctbal
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE'
           AND s_suppkey IN (SELECT l_suppkey FROM big)
         ORDER BY s_name""",
    "q_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
            CAST(year(l_shipdate) AS INTEGER) AS l_year,
            CAST(sum(CAST(l_extendedprice * (1 - l_discount)
              AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
            count(*) AS n_lines
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND n1.n_name <> n2.n_name
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q_cust_distribution" ->
      """WITH c AS (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey)
         SELECT c_count, count(*) AS n_custs FROM c GROUP BY c_count
         ORDER BY n_custs DESC, c_count DESC""",
    "q_top_supplier" ->
      """WITH r AS (
           SELECT l_suppkey,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM r JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_revenue = (SELECT max(total_revenue) FROM r)
         ORDER BY s_suppkey""",
    "q_small_qty_revenue" ->
      """WITH bl AS (
           SELECT l_partkey, l_quantity, l_extendedprice
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_brand = 'Brand#13'),
         a AS (
           SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
               / CAST(count(l_quantity) AS DOUBLE) * 0.2 AS qty_threshold
           FROM bl GROUP BY l_partkey)
         SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2)))
             AS DOUBLE) / 7.0 AS avg_yearly,
           count(*) AS n_lines
         FROM bl JOIN a USING (l_partkey)
         WHERE l_quantity < qty_threshold""",
    "q_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
              AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
            count(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30)""",
    "q_priority_check" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-04-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_local_supplier" ->
      """SELECT n_name,
            CAST(sum(CAST(l_extendedprice * (1 - l_discount)
              AS DECIMAL(28,4))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
            CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_7'
                THEN l_extendedprice * (1 - l_discount) ELSE 0 END
              AS DECIMAL(28,4))) AS DOUBLE)
            / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
              AS DECIMAL(28,4))) AS DOUBLE) AS mkt_share
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region ON n1.n_regionkey = r_regionkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE p_type = 'PROMO' AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY 1""",
    "q_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
         FROM lineitem l1
         JOIN orders ON o_orderkey = l1.l_orderkey
         JOIN supplier ON s_suppkey = l1.l_suppkey
         WHERE o_orderstatus = 'F'
           AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate >
                               o_orderdate + INTERVAL 60 DAY)
         GROUP BY s_name ORDER BY numwait DESC, s_name""",
    "q_dormant_customers" ->
      """SELECT c_mktsegment, count(*) AS numcust,
            CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
              AS totacctbal
         FROM customer
         WHERE c_acctbal > (
             SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
               / CAST(count(c_acctbal) AS DOUBLE)
             FROM customer WHERE c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >
                               (SELECT max(o_orderdate) FROM orders)
                                 - INTERVAL 90 DAY)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_view_attribution" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
             FROM events WHERE event_type = 'view'),
          p AS (SELECT event_id AS purchase_id, user_id AS p_user_id,
              ts AS purchase_ts
             FROM events WHERE event_type = 'purchase')
          SELECT view_id, user_id, view_ts, purchase_id, purchase_ts
          FROM v LEFT JOIN p ON user_id = p_user_id
            AND purchase_ts <= view_ts
            AND purchase_ts >= view_ts - INTERVAL 1 HOUR
          ORDER BY view_id, purchase_id""",
    "q_source_quota" ->
      """SELECT source, doc_id, rk FROM (
           SELECT source, doc_id,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS rk
           FROM documents)
         WHERE rk <= 15 ORDER BY source, rk""",
    "q_quality_sweep" ->
      """WITH b AS (
           SELECT CAST(floor(
               (CAST(len(list_distinct(string_split(text, ' ')))
                   AS DOUBLE)
                / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 10.0)
             AS BIGINT) AS bin,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         g AS (SELECT bin, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS toks
           FROM b GROUP BY bin)
         SELECT CAST(bin AS DOUBLE) / 10.0 AS min_ttr,
           CAST(sum(n_docs) OVER (ORDER BY bin DESC) AS BIGINT)
             AS docs_retained,
           CAST(sum(toks) OVER (ORDER BY bin DESC) AS BIGINT)
             AS tokens_retained
         FROM g ORDER BY min_ttr""",
    "q_profile" -> operators.Extended.profileOrdersOracleSql(),
    "q_table_checksum" -> operators.Extended.tableChecksumOracleSql(),
    "q_anomaly_batch" ->
      """SELECT user_id, event_id, value, running_mean FROM (
           SELECT user_id, event_id, value,
             count(value) OVER w AS prior_n,
             CAST(sum(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
               / CAST(count(value) OVER w AS DOUBLE) AS running_mean
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         WHERE prior_n >= 3 AND value > 2 * running_mean
         ORDER BY user_id, event_id""",
    "q_bloom_join" ->
      s"""SELECT o_orderpriority, $revenueExpr AS revenue, count(*) AS n_lines
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_totalprice > 50000
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_pivot" ->
      """SELECT user_id,
            count(*) FILTER (WHERE event_type = 'click') AS click,
            count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
            count(*) FILTER (WHERE event_type = 'error') AS error,
            count(*) FILTER (WHERE event_type = 'signup') AS signup,
            count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
            l_quantity AS val
         FROM lineitem WHERE l_orderkey < 100
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
         FROM lineitem WHERE l_orderkey < 100
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
         FROM lineitem WHERE l_orderkey < 100
         ORDER BY l_orderkey, l_linenumber, measure""",
    "q_posexplode" ->
      """WITH x AS (SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE doc_id < 20)
         SELECT doc_id, CAST(unnest(range(len(w))) AS INTEGER) AS pos,
            unnest(w) AS token
         FROM x ORDER BY doc_id, pos""",
    "q_window_suite" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
            CAST(rank() OVER w AS INTEGER) AS rnk,
            CAST(dense_rank() OVER w AS INTEGER) AS drnk,
            CAST(ntile(4) OVER w AS INTEGER) AS quartile,
            percent_rank() OVER w AS pct_rank,
            cume_dist() OVER w AS cdist,
            lead(o_orderkey, 1) OVER w AS next_key,
            lag(o_orderkey, 1) OVER w AS prev_key,
            first_value(o_orderkey) OVER
              (PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key
         FROM orders WHERE o_orderkey < 500
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderkey""",
    "q_string_fns" ->
      """SELECT c_custkey,
            upper(c_name) AS upper_name,
            lower(c_name) AS lower_name,
            CAST(length(c_name) AS INTEGER) AS name_len,
            substr(c_name, 1, 8) AS prefix,
            concat_ws('-', c_mktsegment, c_name) AS tagged,
            lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
            regexp_replace(c_name, '[0-9]+', '#', 'g') AS digits_masked,
            regexp_extract(c_name, '([0-9]+)', 1) AS extracted_num,
            split_part(c_name, '#', 2) AS name_num,
            CAST(levenshtein(c_name, 'Customer#000000001') AS INTEGER)
              AS edit_dist,
            reverse(c_name) AS reversed,
            trim('  pad  ') AS trimmed
         FROM customer ORDER BY c_custkey""",
    "q_date_fns" ->
      """SELECT o_orderkey,
            CAST(year(o_orderdate) AS INTEGER) AS yr,
            CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
            CAST(month(o_orderdate) AS INTEGER) AS mo,
            CAST(day(o_orderdate) AS INTEGER) AS dom,
            date_trunc('month', o_orderdate) AS month_start,
            last_day(o_orderdate) AS month_end,
            CAST(o_orderdate AS DATE) + 30 AS due_date,
            CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-01-01')
              AS INTEGER) AS days_to_2024
         FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""",
    "q_null_fns" ->
      """SELECT c_custkey,
            coalesce(max_price, 0.0) AS max_or_zero,
            nullif(n_orders, 0) AS orders_or_null,
            CASE WHEN n_orders > 0 THEN 'active' ELSE 'inactive' END AS status,
            max_price IS NULL AS never_ordered
         FROM (
           SELECT c_custkey, count(o_orderkey) AS n_orders,
              max(o_totalprice) AS max_price
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey)
         ORDER BY c_custkey""",
    "q_mode" ->
      """SELECT user_id, modal_type, cnt FROM (
           SELECT user_id, event_type AS modal_type, count(*) AS cnt,
             row_number() OVER (PARTITION BY user_id
               ORDER BY count(*) DESC, event_type) AS rn
           FROM events GROUP BY user_id, event_type)
         WHERE rn = 1 ORDER BY user_id""",
    "q_string_agg" ->
      """SELECT c_mktsegment,
            string_agg(c_name, ',' ORDER BY c_name) AS names,
            count(*) AS n
         FROM customer WHERE c_custkey <= 30
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_correlation" ->
      """SELECT l_returnflag, count(*) AS n,
            round((CAST(count(*) AS DOUBLE)
               * CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
             - CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)
               * CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE))
            / (sqrt(CAST(count(*) AS DOUBLE)
                 * CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE)
               - CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)
                 * CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE))
               * sqrt(CAST(count(*) AS DOUBLE)
                 * CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
               - CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
                 * CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE))), 9)
              AS corr_qty_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_decl_agg" ->
      """SELECT o_orderpriority,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS total_cents
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_typed_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
              / 100.0 AS total_price
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "q_cogroup" ->
      """WITH v AS (
           SELECT user_id, count(*) AS n_views FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         vl AS (
           SELECT user_id, value AS last_view_value FROM (
             SELECT user_id, value, row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
             FROM events WHERE event_type = 'view') WHERE rn = 1),
         p AS (
           SELECT user_id, count(*) AS n_purchases FROM events
           WHERE event_type = 'purchase' GROUP BY user_id),
         pl AS (
           SELECT user_id, value AS last_purchase_value FROM (
             SELECT user_id, value, row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
             FROM events WHERE event_type = 'purchase') WHERE rn = 1)
         SELECT u.user_id, coalesce(n_views, 0) AS n_views,
           coalesce(n_purchases, 0) AS n_purchases,
           last_view_value, last_purchase_value
         FROM (SELECT DISTINCT user_id FROM events
               WHERE event_type IN ('view', 'purchase')) u
         LEFT JOIN v USING (user_id) LEFT JOIN vl USING (user_id)
         LEFT JOIN p USING (user_id) LEFT JOIN pl USING (user_id)
         ORDER BY user_id""",
    "q_nullsafe_join" ->
      """WITH keyed AS (
           SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderpriority END AS k
           FROM orders WHERE o_orderkey < 500),
         dim AS (
           SELECT k, coalesce(k, 'UNKNOWN') AS dim_tag FROM (
             SELECT DISTINCT o_orderpriority AS k FROM orders
             UNION ALL SELECT NULL))
         SELECT o_orderkey, dim_tag
         FROM keyed JOIN dim ON keyed.k IS NOT DISTINCT FROM dim.k
         ORDER BY o_orderkey""",
    "q_na_clean" ->
      """WITH w AS (
           SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN NULL
                  ELSE c_acctbal END AS bal,
             CASE WHEN c_custkey % 3 = 0 THEN NULL
                  ELSE c_mktsegment END AS seg
           FROM customer)
         SELECT c_custkey, coalesce(bal, 0.0) AS bal,
           CASE WHEN seg = 'MACHINERY' THEN 'MACH' ELSE seg END AS seg
         FROM w WHERE seg IS NOT NULL ORDER BY c_custkey""",
    "q_regression" ->
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,4)))
               AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4)))
               AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx), 9) AS slope,
           round((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
             / CAST(n AS DOUBLE), 6) AS intercept
         FROM m ORDER BY l_returnflag""",
    "q_brand_revenue" ->
      s"""SELECT p_brand, $revenueExpr AS revenue,
            ${Cols.sqlDecAvg("p_retailprice", 2)} AS avg_retail,
            count(*) AS n_lines
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand ORDER BY p_brand""",
    "q_supplier_balances" ->
      s"""SELECT n_name, count(*) AS n_suppliers,
            ${Cols.sqlDecSum("s_acctbal", 2)} AS total_acctbal,
            max(s_acctbal) AS max_acctbal
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name""",
    "q_variance" ->
      """SELECT event_type, count(value) AS n,
            round((CAST(sum(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
              - CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                * CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                / CAST(count(value) AS DOUBLE))
              / (CAST(count(value) AS DOUBLE) - 1.0), 9) AS var_value,
            round(sqrt((CAST(sum(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
              - CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                * CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                / CAST(count(value) AS DOUBLE))
              / (CAST(count(value) AS DOUBLE) - 1.0)), 9) AS stddev_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_contamination" ->
      """SELECT source, count(*) AS n_docs,
            CAST(sum(CASE WHEN contains(text, 'spark table scan')
                OR contains(text, 'window batch stream')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
         FROM documents GROUP BY source ORDER BY source""",
    "q_decontaminate" -> operators.Pipeline.decontaminationOracleSql(),
    "q_corpus_sample" ->
      """SELECT lang,
            array_to_string(list_transform(
              (array_agg(doc_id ORDER BY md5(CAST(doc_id AS VARCHAR))))[1:5],
              x -> CAST(x AS VARCHAR)), ',') AS sample_ids
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_split_assign" ->
      """SELECT lang,
            CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                IN ('0','1','2','3','4','5','6','7','8','9','a','b')
              THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d')
              THEN 'val' ELSE 'test' END AS split,
            count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY 1, 2 ORDER BY lang, split""",
    "q_temperature_resample" ->
      """WITH c AS (SELECT lang, count(*) AS n_lang FROM documents
            GROUP BY lang),
         tot AS (SELECT CAST(sum(n_lang) AS BIGINT) AS n,
            CAST(sum(CAST(pow(n_lang, 0.5) AS DECIMAL(28,12))) AS DOUBLE)
              AS s
           FROM c),
         t AS (SELECT lang, n_lang,
            CAST(floor(tot.n * pow(n_lang, 0.5) / tot.s) AS BIGINT)
              AS target
           FROM c, tot),
         r AS (SELECT doc_id, d.lang, n_lang, target,
            row_number() OVER (PARTITION BY d.lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents d JOIN t ON d.lang = t.lang),
         cp AS (SELECT doc_id, lang,
            target // n_lang
              + CASE WHEN rk <= target % n_lang THEN 1 ELSE 0 END
              AS n_copies
           FROM r)
         SELECT doc_id, lang, CAST(u.copy AS INTEGER) AS copy
         FROM cp, unnest(range(n_copies)) AS u(copy)
         ORDER BY doc_id, copy""",
    "q_embed_cov" -> vector.Similarity.embeddingCovarianceOracleSql,
    "q_power_iter" -> vector.Similarity.powerIterationOracleSql(),
    "q_pca_project" -> vector.Similarity.pcaProjectOracleSql(),
    "q_pca_top2" -> vector.Similarity.pcaTop2OracleSql(),
    "q_pca_topk" -> vector.Similarity.pcaTopKOracleSql(),
    "q_rand_proj" -> vector.Similarity.randomProjectionOracleSql(),
    "q_mean_pairwise" -> vector.Similarity.meanPairwiseDotOracleSql,
    "q_pmi" -> T.pmiCollocationsOracleSql(),
    "q_lr_quality" -> text.QualityModel.trainAndScoreOracleSql(),
    "q_lr_learnable" -> text.QualityModel.trainAndScoreLengthOracleSql(),
    "q_calibration" -> text.QualityModel.calibrationOracleSql(),
    "q_quantize" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE vec_id < 100),
         q AS (SELECT vec_id, list_min(e) AS min_val, list_max(e) AS max_val,
            CASE WHEN list_max(e) = list_min(e)
            THEN list_transform(e, x -> 0)
            ELSE list_transform(e, x -> CAST(round(
              (x - list_min(e)) / (list_max(e) - list_min(e)) * 255)
              AS INTEGER)) END AS q8v
           FROM v)
         SELECT vec_id, min_val, max_val,
            array_to_string(list_transform(q8v, x -> CAST(x AS VARCHAR)), ',')
              AS q8,
            CAST(list_sum(q8v) AS BIGINT) AS q8_sum
         FROM q ORDER BY vec_id""",
    "q_token_stats" ->
      """SELECT doc_id, lang,
            CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
            CAST(list_sum(list_transform(string_split(text, ' '),
              w -> (length(w) + 3) // 4)) AS BIGINT) AS n_subwords,
            CAST(length(text) AS INTEGER) AS len_chars
         FROM documents ORDER BY doc_id""",
    "q_diversity" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents),
          c AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY doc_id, w),
          d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
              count(*) AS n_types, CAST(sum(c * c) AS BIGINT) AS ss
            FROM c GROUP BY doc_id)
          SELECT doc_id, n_tokens, n_types,
            CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
            1.0 - CAST(ss AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE)
              AS simpson
          FROM d ORDER BY doc_id""",
    "q_vocab_growth" -> T.vocabGrowthOracleSql(),
    "q_ks_test" -> T.lengthKsOracleSql(),
    "q_gini" -> operators.Extended.giniRevenueOracleSql(),
    "q_weighted_median" ->
      operators.Extended.weightedMedianQtyOracleSql(),
    "q_corpus_stats" ->
      """SELECT lang, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS total_chars,
            CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars,
            CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
            min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_quality" ->
      """SELECT doc_id, lang,
            CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
            CAST(len(list_filter(string_split(text, ' '),
              x -> x IN ('the', 'a'))) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
            CAST(length(replace(text, ' ', '')) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len,
            CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE)
              AS distinct_token_ratio
         FROM documents ORDER BY doc_id""",
    "q_gopher_rep" -> T.gopherRepetitionOracleSql(),
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
            FROM documents),
         g AS (SELECT doc_id, lang,
            CAST(greatest(len(w) - 2, 1) AS BIGINT) AS n_grams,
            CAST(len(list_distinct(
              CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_transform(range(0, len(w) - 2),
                i -> array_to_string(w[i+1:i+3], ' ')) END)) AS BIGINT)
              AS n_distinct
           FROM t)
         SELECT doc_id, lang, n_grams, n_distinct,
            round(1.0 - CAST(n_distinct AS DOUBLE)
              / CAST(n_grams AS DOUBLE), 6) AS rep_ratio,
            round(1.0 - CAST(n_distinct AS DOUBLE)
              / CAST(n_grams AS DOUBLE), 6) > 0.05 AS repetitive
         FROM g ORDER BY doc_id""",
    "q_md5_fp" ->
      "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id",
    // Engine-neutral rolling hash: per-token base hash = first 8 md5 hex
    // chars as an integer, identical in both engines (the same trick that
    // oracled the SRP-LSH constants).
    "q_rolling_fp" ->
      """SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                 t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 36028797018963967) AS rolling_fp
         FROM documents ORDER BY doc_id""",
    // BM25: determinism contract mirrored from TextAnalysis.bm25Rank —
    // integer aggs, idf rounded to 9 decimals right after ln(), per-doc
    // score summed in fixed column order (s1+s2+s3). Float literals are
    // written as the same arithmetic Scala performs ((1.2 + 1.0), not
    // 2.2) so both engines compute identical doubles.
    "q_bm25" ->
      s"""WITH $bm25Ctes
         SELECT doc_id, score, rk FROM r WHERE rk <= 20 ORDER BY rk""",
    "q_hybrid" ->
      s"""WITH $bm25Ctes,
         ${operators.Pipeline.hybridSearchOracleTail()}""",
    // char entropy: per-char terms rounded to 9 decimals then summed as
    // DECIMAL (order-independent) — same contract as the Spark plan.
    "q_char_entropy" ->
      """WITH idx AS (
           SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i
           FROM documents),
         chars AS (
           SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch
           FROM idx),
         counts AS (
           SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
         n AS (SELECT doc_id, count(*) AS n FROM chars GROUP BY 1),
         terms AS (
           SELECT doc_id, n,
             CAST(round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
               log2(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)), 9)
               AS DECIMAL(20,9)) AS term
           FROM counts JOIN n USING (doc_id))
         SELECT doc_id, n AS n_chars_tok, count(*) AS distinct_chars,
           CAST(sum(term) AS DOUBLE) AS entropy_bits
         FROM terms GROUP BY doc_id, n ORDER BY doc_id""",
    // bigram LM: ln(c12/c1) rounded to 9 decimals, summed as DECIMAL;
    // the average is one final double division.
    "q_bigram_lm" ->
      """WITH w AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         bg AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
           FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                 FROM w WHERE len(w) >= 2)),
         c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
         c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
         lm AS (
           SELECT w1, w2,
             CAST(round(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)), 9)
               AS DECIMAL(20,9)) AS lp
           FROM c12 JOIN c1 USING (w1))
         SELECT doc_id, count(*) AS n_bigrams,
           CAST(sum(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_logprob
         FROM bg JOIN lm USING (w1, w2)
         WHERE doc_id < 200
         GROUP BY doc_id ORDER BY doc_id""",
    // argmax tie-break mirrors Spark's sort_array(desc) on struct(score,
    // lang): score DESC then candidate lang DESC.
    "q_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w, text
            FROM documents),
         s AS (SELECT doc_id, lang,
            unnest(['en','es','fr','de','zh']) AS cand,
            unnest([
              len(list_filter(w, x -> x IN ('the','a','of','and','is'))),
              len(list_filter(w, x -> x IN ('el','la','de','que','y'))),
              len(list_filter(w, x -> x IN ('le','la','de','et','un'))),
              len(list_filter(w, x -> x IN ('der','die','das','und','ist'))),
              CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]')
                THEN 100 ELSE 0 END]) AS score
           FROM t),
         r AS (SELECT doc_id, lang, cand, score,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, cand DESC) AS rn
           FROM s)
         SELECT doc_id, lang AS labeled_lang, cand AS predicted_lang,
            CAST(score AS BIGINT) AS score
         FROM r WHERE rn = 1 ORDER BY doc_id""",
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
         FROM documents GROUP BY text ORDER BY keeper_id""",
    "q_dedup_digest" ->
      """SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
         FROM documents GROUP BY md5(text) ORDER BY keeper_id""",
    // Full MinHash+LSH under the oracle via engine-neutral hashing
    // (dedup/Dedup.scala NeutralMinHash — constants shared with the plan).
    "q_minhash_neutral" -> D.NeutralMinHash.oracleSql(),
    "q_minhash_est" -> D.minhashEstimateOracleSql(),
    "q_lsh_recall" -> D.lshRecallOracleSql(threshold = 0.8),
    "q_source_overlap" -> D.sourceOverlapOracleSql(),
    "q_dedup_incremental" -> D.NeutralMinHash.incrementalOracleSql(),
    "q_simhash_neutral" -> D.simhashNeutralOracleSql(),
    "q_substring_dedup" -> D.substringDedupOracleSql(),
    "q_sorted_neighborhood" -> D.sortedNeighborhoodOracleSql(),
    "q_fuzzy_join" -> D.fuzzyJoinOracleSql(),
    "q_fuzzy_jw" -> D.fuzzyJoinJaroWinklerOracleSql(),
    "q_boilerplate" -> T.boilerplateOracleSql(),
    "q_equidepth_hist" -> R.equiDepthOracleSql(),
    "q_cms_freq" -> operators.Extended.cmsOracleSql(),
    // Sketch error bounds: DuckDB recomputes the EXACT side and pins
    // every within-bound boolean literally TRUE — if a sketch estimate
    // ever leaves its configured bound (or the exact side drifts), the
    // Spark row carries `false` and the hash compare fails the gate.
    "q_hll_bound" ->
      """WITH per AS (
           SELECT event_type, count(DISTINCT event_id) AS exact_ids
           FROM events GROUP BY event_type)
         SELECT event_type, exact_ids,
           TRUE AS hll_within_5pct, TRUE AS acd_within_6pct FROM per
         UNION ALL
         SELECT 'ALL', count(DISTINCT event_id), TRUE, TRUE FROM events
         ORDER BY event_type""",
    "q_kll_bound" ->
      """WITH per AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY event_type)
         SELECT event_type, n, TRUE AS kll_p50_in_6pp_band,
           TRUE AS kll_p90_in_6pp_band, TRUE AS gk_p50_in_6pp_band
         FROM per
         UNION ALL
         SELECT 'ALL', CAST(count(*) AS BIGINT), TRUE, TRUE, TRUE
         FROM events
         ORDER BY event_type""",
    "q_theta_bound" ->
      """SELECT event_type, count(DISTINCT event_id) AS exact_ids,
           TRUE AS theta_within_5pct
         FROM events GROUP BY event_type
         UNION ALL
         SELECT 'ALL', count(DISTINCT event_id), TRUE FROM events
         ORDER BY event_type""",
    "q_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
            $revenueExpr AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1997-03-15'
            AND l_shipdate > TIMESTAMP '1997-03-15'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",
    "q_mad_outliers" ->
      """WITH med AS (
           SELECT event_type, median(value) AS med FROM events
           GROUP BY event_type),
         dev AS (
           SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
           FROM events e JOIN med m USING (event_type)),
         mad AS (
           SELECT event_type, any_value(med) AS med, median(adev) AS mad
           FROM dev GROUP BY event_type)
         SELECT d.event_type, m.med, m.mad,
           CAST(sum(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers,
           count(*) AS n_total
         FROM dev d JOIN mad m USING (event_type)
         GROUP BY d.event_type, m.med, m.mad ORDER BY d.event_type""",
    "q_pagerank" -> operators.Graph.pagerankOracleSql(),
    "q_bfs_hops" -> operators.Graph.bfsHopsOracleSql(),
    "q_label_prop" -> operators.Graph.labelPropagationOracleSql(),
    "q_time_weighted_avg" -> E.timeWeightedAvgOracleSql(),
    "q_sliding_distinct" -> E.slidingDistinctOracleSql(),
    "q_streaks" -> E.activityStreaksOracleSql(),
    "q_contingency" -> E.contingencyChi2OracleSql(),
    "q_autocorrelation" -> E.dailyAutocorrelationOracleSql(),
    "q_cusum" -> E.cusumDailyOracleSql,
    "q_rolling_median" -> E.rollingMedianDailyOracleSql(),
    "q_decay_score" -> E.decayedPopularityOracleSql,
    "q_ref_integrity" -> operators.Extended.refIntegrityOracleSql(),
    "q_rfm_segments" -> R.rfmSegmentsOracleSql(),
    "q_epoch_shuffle" ->
      operators.Pipeline.deterministicShuffleOracleSql(),
    "q_weighted_sample" -> operators.Pipeline.weightedSampleOracleSql(),
    "q_waterfill" -> operators.Pipeline.tokenBudgetWaterfillOracleSql(),
    "q_dedup_rate" -> operators.Pipeline.dedupRateBySourceOracleSql(),
    "q_pipeline_e2e" -> operators.Pipeline.pretrainPipelineOracleSql(),
    "q_topk_share" -> operators.Extended.topKRevenueShareOracleSql(),
    "q_monthly_growth" -> operators.Extended.monthlyGrowthOracleSql(),
    "q_calendar_dim" -> operators.Extended.calendarDimOracleSql(),
    "q_copurchase" ->
      """WITH items AS (
           SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2
         ORDER BY n_orders DESC, part_a, part_b LIMIT 50""",
    "q_triangles" -> operators.Graph.trianglesOracleSql(),
    "q_synth_stream" ->
      """SELECT date_trunc('hour',
              TIMESTAMP '2024-01-01 00:00:00' + event_id * INTERVAL 1 SECOND)
              AS window_start,
            CASE event_id % 5 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
              WHEN 2 THEN 'purchase' WHEN 3 THEN 'scroll' ELSE 'hover'
            END AS event_type,
            count(*) AS n,
            CAST(sum((event_id * 31) % 10000) AS BIGINT) AS sum_cents
          FROM (SELECT range AS event_id FROM range(0, 50000))
          GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_synth_source" ->
      """SELECT CASE event_id % 5 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
              WHEN 2 THEN 'purchase' WHEN 3 THEN 'scroll' ELSE 'hover'
            END AS event_type,
            count(*) AS n,
            CAST(sum((event_id * 31) % 10000) AS BIGINT) AS sum_cents,
            min(event_id) AS min_id, max(event_id) AS max_id
          FROM (SELECT range AS event_id FROM range(0, 100000))
          WHERE event_id >= 25000 AND event_id < 75000
          GROUP BY 1 ORDER BY 1""",
    // exactly-once readout of the at-least-once stream: the oracle
    // delivers each id ONCE via range(n) — a duplicate surviving the
    // streaming dedup (or a lost row) breaks a sum and fails the hash
    "q_stream_dedup" ->
      """SELECT CASE event_id % 5 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
              WHEN 2 THEN 'purchase' WHEN 3 THEN 'scroll' ELSE 'hover'
            END AS event_type,
            count(*) AS n,
            CAST(sum(event_id) AS BIGINT) AS sum_ids,
            CAST(sum((event_id * 31) % 10000) AS BIGINT) AS sum_cents,
            min(event_id) AS min_id, max(event_id) AS max_id
          FROM (SELECT range AS event_id FROM range(0, 50000))
          GROUP BY 1 ORDER BY 1""",
    "q_dpp_date" -> sources.Sources.dppDateRollupOracleSql,
    "q_bucket_join" -> sources.Sources.bucketedJoinAggOracleSql,
    "q_bpe_tokens" -> T.bpeTokenStatsOracleSql,
    "q_fertility" -> T.tokenizerFertilityOracleSql,
    "q_bpe_train" -> T.bpeTrainOracleSql(),
    "q_jaccard_pairs" -> jaccardAllPairsOracleSql(0.5),
    // slicing partitions the shingle-hash space, so Σ slice partials
    // reproduce the quadratic all-pairs oracle bit-for-bit
    "q_jaccard_sliced" -> jaccardAllPairsOracleSql(0.5,
      where = "WHERE doc_id % 2 = 0"),
    "q_containment" -> D.containmentOracleSql(),
    // Same exact all-pairs oracle at the prefix variants' thresholds —
    // prefix filtering is lossless, so the sub-quadratic plans must
    // reproduce the quadratic self-join bit-for-bit at BOTH the loose
    // demo threshold and the production one.
    "q_jaccard_prefix" -> jaccardAllPairsOracleSql(0.4),
    "q_jaccard_prefix_hi" -> jaccardAllPairsOracleSql(0.8),
    // Connected components = min reachable id via recursive CTE over the
    // same jaccard pair graph the Spark side propagates labels on.
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $nearDupClusterCtes
         SELECT doc_id, cluster_id, cluster_id = doc_id AS is_canonical
         FROM lab ORDER BY doc_id""",
    // Same pair/closure CTE as q_dedup_clusters, then cluster sizes and
    // the 1/|cluster| soft-dedup weight (singletons weigh 1.0).
    "q_dedup_weights" ->
      s"""WITH RECURSIVE $nearDupClusterCtes,
         csz AS (SELECT cluster_id, count(*) AS cluster_size
           FROM lab GROUP BY cluster_id),
         w2 AS (
           SELECT l.doc_id, l.cluster_id, c.cluster_size
           FROM lab l JOIN csz c USING (cluster_id)
           UNION ALL
           SELECT doc_id, doc_id AS cluster_id,
             CAST(1 AS BIGINT) AS cluster_size
           FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM lab))
         SELECT doc_id, cluster_id, cluster_size,
           round(CAST(1.0 AS DOUBLE) / CAST(cluster_size AS DOUBLE), 9)
             AS weight
         FROM w2 ORDER BY doc_id""",
    "q_budget_select" -> operators.Pipeline.budgetSelectOracleSql(),
    "q_importance" -> operators.Pipeline.importanceScoreOracleSql(),
    // Same pair/closure CTE as q_dedup_clusters, then the split gate
    // hashed on the CLUSTER id (singletons keep their own id) — the
    // leakage-safety property verified is exactly the oracle's.
    "q_split_leakage" ->
      s"""WITH RECURSIVE $nearDupClusterCtes,
         alldocs AS (
           SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
           FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id)
         SELECT doc_id, cluster_id,
           CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)
               IN ('0','1','2','3','4','5','6','7','8','9','a','b')
             THEN 'train'
             WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)
               IN ('c','d')
             THEN 'val' ELSE 'test' END AS split
         FROM alldocs ORDER BY doc_id""",
    // Same pair/closure CTE as q_dedup_clusters, then survivor pick:
    // largest doc per cluster (tie → lowest id) + all singletons.
    "q_cluster_canonical" ->
      s"""WITH RECURSIVE $nearDupClusterCtes,
         cl AS (
           SELECT l.doc_id, l.cluster_id, d.n_chars,
             row_number() OVER (PARTITION BY l.cluster_id
               ORDER BY d.n_chars DESC, l.doc_id) AS rn,
             count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size
           FROM lab l JOIN documents d USING (doc_id))
         SELECT doc_id, cluster_id, cluster_size, n_chars
         FROM cl WHERE rn = 1
         UNION ALL
         SELECT doc_id, doc_id AS cluster_id,
           CAST(1 AS BIGINT) AS cluster_size, n_chars
         FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM lab)
         ORDER BY doc_id""",
    // tf·N/df (not tf·ln(N/df)): identical ranking, one deterministic
    // IEEE division instead of a libm ln that can differ in the last ulp.
    "q_tfidf" ->
      """WITH t AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
         df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY tok),
         n AS (SELECT count(*) AS n_docs FROM documents),
         s AS (
           SELECT doc_id, tok, tf, df,
             CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score
           FROM tf JOIN df USING (tok), n),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, tok) AS INTEGER) AS rk FROM s)
         SELECT doc_id, tok AS term, tf, df, score, rk
         FROM r WHERE rk <= 3 ORDER BY doc_id, rk""",
    "q_chunked" ->
      """WITH tok AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         SELECT doc_id,
           CAST(start // 40 AS INTEGER) AS chunk_idx,
           CAST(len(w[start + 1 : start + 50]) AS INTEGER) AS chunk_tokens,
           md5(array_to_string(w[start + 1 : start + 50], ' ')) AS chunk_md5
         FROM tok, unnest(range(0, greatest(len(w), 1), 40)) AS u(start)
         ORDER BY doc_id, chunk_idx""",
    "q_pii_scrub" ->
      """WITH p AS (
           SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
               THEN 'contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com about ' || text
               ELSE text END AS t
           FROM documents WHERE doc_id < 200)
         SELECT doc_id,
           md5(regexp_replace(t, '[a-z0-9._]+@[a-z0-9.-]+', '[REDACTED]',
             'g')) AS scrubbed_md5,
           CAST(len(regexp_split_to_array(t, '[a-z0-9._]+@[a-z0-9.-]+')) - 1
             AS INTEGER) AS n_redactions
         FROM p ORDER BY doc_id""",
    "q_pack_greedy" ->
      """WITH d AS (
           SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents),
         c AS (
           SELECT lang, doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS before
           FROM d)
         SELECT lang, doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           before // 2000 AS bin_id
         FROM c ORDER BY lang, doc_id""",
    "q_pack_bpe" -> operators.Pipeline.packGreedyBpeOracleSql(),
    "q_heavy_hitters" ->
      """WITH t AS (
           SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
         tot AS (SELECT count(*) AS total FROM t)
         SELECT tok AS token, n,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
         FROM c, tot
         WHERE CAST(n AS DOUBLE) >= 0.01 * CAST(total AS DOUBLE)
         ORDER BY n DESC, token""",
    "q_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
           < CASE WHEN lang = 'en' THEN 500 WHEN lang = 'es' THEN 400
                  WHEN lang = 'fr' THEN 300 WHEN lang = 'de' THEN 200
                  ELSE 100 END
         ORDER BY doc_id""",
    "q_pairwise_cosine" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE vec_id < 10),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            a.e AS ea, b.e AS eb FROM v a JOIN v b ON a.vec_id < b.vec_id),
         c AS (SELECT id_a, id_b,
            list_sum(list_transform(range(1, 65), i -> ea[i] * eb[i])) AS d,
            sqrt(list_sum(list_transform(range(1, 65), i -> ea[i] * ea[i]))) AS na,
            sqrt(list_sum(list_transform(range(1, 65), i -> eb[i] * eb[i]))) AS nb
           FROM p)
         SELECT id_a, id_b, round(d / (na * nb), 3) AS cos
         FROM c ORDER BY id_a, id_b""",
    "q_knn_brute" -> knnBruteOracleSql,
    "q_hard_negatives" -> V.hardNegativesOracleSql(),
    "q_knn_quantized" -> knnQuantizedOracleSql,
    "q_ann_recall" ->
      s"""SELECT b.query_id,
            CAST(count(m.vec_id) AS DOUBLE) / 10.0 AS recall
          FROM ($knnBruteOracleSql) b
          LEFT JOIN (${lshMultiProbeOracleSql(bits = 6, nQueries = 5, k = 10)}) m
            ON b.query_id = m.query_id AND b.vec_id = m.vec_id
          GROUP BY b.query_id ORDER BY b.query_id""",
    "q_pq_recall" ->
      s"""SELECT b.query_id,
            CAST(count(m.vec_id) AS DOUBLE) / 10.0 AS recall
          FROM ($knnBruteOracleSql) b
          LEFT JOIN ($knnPqOracleSql) m
            ON b.query_id = m.query_id AND b.vec_id = m.vec_id
          GROUP BY b.query_id ORDER BY b.query_id""",
    "q_knn_lsh" -> lshOracleSql(bits = 6, nQueries = 5, k = 10),
    "q_knn_lsh_mp" -> lshMultiProbeOracleSql(bits = 6, nQueries = 5, k = 10),
    "q_cosine_neardup" -> cosineNearDupOracleSql(bits = 8, threshold = 0.35),
    "q_semdedup" -> semDedupOracleSql(threshold = 0.40),
    "q_domain_assign" -> domainAssignOracleSql,
    "q_knn_ivf" -> ivfOracleSql(nprobe = 1),
    // identical math to q_knn_ivf — the persisted build/query split and
    // the parquet double round-trip are what the compare proves
    "q_knn_ivf_disk" -> ivfOracleSql(nprobe = 1),
    "q_knn_ivf_mp" -> ivfOracleSql(nprobe = 2),
    "q_knn_ivf_refined" -> ivfRefinedOracleSql,
    "q_kmeans" -> V.kmeansOracleSql(),
    "q_knn_ivf_trained" -> V.ivfTrainedOracleSql(),
    "q_ann_recall_ivf" -> V.ivfTrainedRecallOracleSql(),
    "q_knn_pq" -> knnPqOracleSql,
    "q_media_features" -> M.featurePipelineOracleSql,
    "q_media_frames" -> M.framePipelineOracleSql,
    "q_media_stats" ->
      """SELECT 'image/stub-' || lang AS media_type,
            count(*) AS n_items,
            CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
            CAST(min(octet_length(encode(text))) AS INTEGER) AS min_bytes,
            CAST(max(octet_length(encode(text))) AS INTEGER) AS max_bytes
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_stream_windowed" ->
      s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
            count(*) AS n, ${Cols.sqlDecSum("value")} AS sum_value
          FROM events
          WHERE ts IS NOT NULL AND user_id IS NOT NULL
            AND value IS NOT NULL AND event_type IS NOT NULL
          GROUP BY 1, 2 ORDER BY 1, 2""",
    // streaming session_window parity: same strict-overlap >= boundary
    // as q_session_window, over the validated stream
    "q_stream_sessions" ->
      sessionWindowOracleSql(validated = true, withLastTs = false)
  )

  /** BM25 oracle CTE chain (ends in `r(doc_id, score, rk)`) — shared
    * between q_bm25 and the q_hybrid RRF fusion so the scoring formula
    * has one definition. */
  private val bm25Ctes: String =
    """toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS t
           FROM documents),
         stats AS (
           SELECT t, count(*) AS cf, count(DISTINCT doc_id) AS df
           FROM toks GROUP BY t),
         query AS (
           SELECT * FROM (
             SELECT t, df, row_number() OVER (ORDER BY cf DESC, t) AS qrk
             FROM stats) WHERE qrk <= 3),
         n AS (
           SELECT count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tot_len
           FROM documents),
         dl AS (
           SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
           FROM documents),
         tf AS (
           SELECT doc_id, t, df, qrk, count(*) AS tf
           FROM toks JOIN query USING (t) GROUP BY 1, 2, 3, 4),
         s AS (
           SELECT tf.doc_id, qrk,
             round(ln((CAST(n_docs AS DOUBLE) - df + 0.5) /
                      (CAST(df AS DOUBLE) + 0.5)), 9)
               * (CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
               (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
                 CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) /
                 CAST(tot_len AS DOUBLE))) AS s
           FROM tf JOIN dl USING (doc_id), n),
         perdoc AS (
           SELECT doc_id,
             max(CASE WHEN qrk = 1 THEN s END) AS s1,
             max(CASE WHEN qrk = 2 THEN s END) AS s2,
             max(CASE WHEN qrk = 3 THEN s END) AS s3
           FROM s GROUP BY doc_id),
         sc AS (
           SELECT doc_id,
             coalesce(s1, 0) + coalesce(s2, 0) + coalesce(s3, 0) AS score
           FROM perdoc),
         r AS (
           SELECT doc_id, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id)
               AS INTEGER) AS rk
           FROM sc)"""

  /** One source of truth for the native-session-window oracle (the
    * strict-overlap `>=` boundary and the 30-min/1800000000 µs gap live
    * HERE only); q_session_window and q_stream_sessions differ just in
    * the stream-validation filter and the last_ts column. */
  private def sessionWindowOracleSql(validated: Boolean,
      withLastTs: Boolean): String = {
    val where = if (validated)
      """
           WHERE ts IS NOT NULL AND user_id IS NOT NULL
             AND value IS NOT NULL AND event_type IS NOT NULL"""
    else ""
    val lastTs = if (withLastTs) "max(ts) AS last_ts," else ""
    s"""WITH x AS (
           SELECT user_id, ts, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events$where),
         y AS (
           SELECT user_id, ts, event_id,
             CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
               THEN 1 ELSE 0 END AS new_session
           FROM x),
         z AS (
           SELECT user_id, ts,
             CAST(sum(new_session) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM y)
         SELECT user_id, min(ts) AS session_start,
            max(ts) + INTERVAL 30 MINUTE AS session_end,
            $lastTs count(*) AS n_events
         FROM z GROUP BY user_id, session_id
         ORDER BY user_id, session_start"""
  }
}
