package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Cols._

/** Skew-handling primitives (builder spec: "Skewed keys → salting or AQE
  * skew-join").
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`) is the first line of
  * defense — it splits oversized shuffle partitions at runtime with no
  * code change. Salting is the explicit fallback for aggregations (AQE
  * does not split a single hot GROUP BY key) and for joins on engines/
  * configs without AQE. Both forms below are semantically identical to
  * their unsalted counterparts — verified against the same oracle SQL as
  * the plain aggregation.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates on
    * (key, hash(row-id) % salt) so a hot key spreads over `salt`
    * reducers; phase 2 merges the partials. Exact for any associative
    * aggregate — here count + decimal sum (so the final double is
    * bit-identical to the unsalted plan). */
  def saltedValueSums(events: DataFrame, salt: Int = 16): DataFrame = {
    val phase1 = events
      .withColumn("_salt", pmod(xxhash64(col("event_id")), lit(salt)))
      .groupBy(col("event_type"), col("_salt"))
      .agg(
        count(lit(1)).as("n_part"),
        sum(col("value").cast("decimal(28,6)")).as("sum_part"))
    phase1
      .groupBy(col("event_type"))
      .agg(
        sum(col("n_part")).as("n"),
        sum(col("sum_part")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Salted join for a skewed fact key: the fact side gets a random-ish
    * salt in [0, salt); the (small, replicable) dimension side is exploded
    * `salt` times so every salted fact partition finds its match. Exact
    * join semantics; shuffle of the hot key spreads over `salt`
    * partitions. For genuinely small dims prefer `broadcast()`; this form
    * is for mid-size dims where broadcast doesn't fit but one key
    * dominates the fact table. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, rowSalt: Column, salt: Int = 8): DataFrame = {
    // rowSalt must vary PER ROW of the fact side (salting by the join key
    // would put a hot key's rows back into one partition); callers pass a
    // hash over non-key columns or a per-row id.
    val saltedFact = fact.withColumn("_salt", pmod(rowSalt, lit(salt)))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(explodedDim,
      saltedFact(factKey) === explodedDim(dimKey) &&
        saltedFact("_salt") === explodedDim("_salt"))
      .drop("_salt")
  }

  /** Bloom-filter semi-join reduction: build a Bloom filter over the
    * (smaller) build side's keys, pre-filter the probe side BEFORE its
    * shuffle, then join. At 100 TB this is the classic runtime-filter
    * pattern — rows whose keys cannot match never leave the scan stage,
    * shrinking the shuffle by the join's selectivity. This is the exact
    * shape Spark's own `InjectRuntimeFilter` emits: the filter is built
    * IN-ENGINE by `BloomFilterAggregate` inside a scalar subquery and
    * `BloomFilterMightContain` probes it — the serialized filter flows
    * executor→probe stage as a subquery result, never through the
    * driver and never into the plan tree. (The previous driver-built
    * `stat.bloomFilter` + 1.2 MB foldable binary-literal form poisoned
    * the SESSION: every plan/event string thereafter carried the
    * megabyte literal, measured +4-18 s of first-compile latency on
    * whatever queries FOLLOWED it in a bench run.) False positives only
    * cost wasted shuffle — join correctness is unchanged.
    *
    * `expectedKeys < 0` sizes the filter from a build-side count()
    * first (one cheap columnar count job) — a fixed guess is wrong at
    * every other scale factor. */
  def bloomPrefilteredJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedKeys: Long = -1L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.Shim
    // floor at 1: BloomFilterAggregate rejects estimatedNumItems <= 0 at
    // analysis, and an empty build side must still produce the (empty)
    // join result rather than an AnalysisException
    val nKeys = math.max(1L,
      if (expectedKeys >= 0) expectedKeys else build.count())
    // optimal bits for the target fpp: -n·ln(p)/ln²2
    val numBits = math.max(64L,
      math.ceil(-nKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val buildAgg = build.select(Shim.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(Shim.expression(col(buildKey).cast("long")))),
        Literal(nKeys), Literal(numBits)).toAggregateExpression())
      .as("bf"))
    val probeFilter = Shim.column(BloomFilterMightContain(
      ScalarSubquery(Shim.logicalPlan(buildAgg)),
      new XxHash64(Seq(Shim.expression(col(probeKey).cast("long"))))))
    probe
      .filter(probeFilter)
      .join(build, col(probeKey) === col(buildKey))
  }

  /** Bloom-join demo query: lineitem probe pruned by a Bloom filter over
    * high-value orders, aggregated — identical results to the plain join,
    * checked by the same oracle shape. */
  def bloomRevenueByPriority(lineitem: DataFrame, orders: DataFrame): DataFrame =
    bloomPrefilteredJoin(
      lineitem, orders.filter(col("o_totalprice") > 50000),
      "l_orderkey", "o_orderkey", expectedKeys = -1L)
      .groupBy(col("o_orderpriority"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))

  /** Salted-join demo query: lineitem ⋈ orders through the salted path,
    * aggregated to the same shape as the unsalted `q_join_priority`. */
  def saltedRevenueByPriority(lineitem: DataFrame, orders: DataFrame): DataFrame =
    saltedJoin(lineitem, orders, "l_orderkey", "o_orderkey",
      xxhash64(col("l_linenumber"), col("l_partkey")))
      .groupBy(col("o_orderpriority"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))

  /** Skew DIAGNOSIS report for a join/agg key — the numbers you read
    * BEFORE reaching for the salting/AQE toolkit above: key cardinality,
    * frequency extremes, the max/avg skew ratio, and the derived salt
    * factor (ceil of the ratio — the fan-out that levels the hottest
    * key to the average load). One key-grain aggregation (map-side
    * combinable) plus a 1-row summary; cost is the same counting pass
    * any shuffle of this key would do anyway. */
  def skewReport(lineitem: DataFrame): DataFrame = {
    val freq = lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("f"))
    freq.agg(
      sum(col("f")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("f")).as("max_freq"),
      min(col("f")).as("min_freq"))
      .select(col("n_rows"), col("n_keys"), col("max_freq"),
        col("min_freq"),
        round(col("n_rows").cast("double") /
          col("n_keys").cast("double"), 6).as("avg_freq"),
        round(col("max_freq").cast("double") /
          (col("n_rows").cast("double") / col("n_keys").cast("double")),
          6).as("skew_ratio"),
        ceil(col("max_freq").cast("double") /
          (col("n_rows").cast("double") / col("n_keys").cast("double")))
          .cast("bigint").as("salt_factor"))
  }

  /** DuckDB oracle for [[skewReport]]. */
  def skewReportOracleSql: String =
    """WITH f AS (SELECT l_orderkey, count(*) AS f
           FROM lineitem GROUP BY 1),
       s AS (SELECT CAST(sum(f) AS BIGINT) AS n_rows,
           count(*) AS n_keys, max(f) AS max_freq, min(f) AS min_freq
         FROM f)
       SELECT n_rows, n_keys, max_freq, min_freq,
         round(CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE), 6)
           AS avg_freq,
         round(CAST(max_freq AS DOUBLE) /
           (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)), 6)
           AS skew_ratio,
         CAST(ceil(CAST(max_freq AS DOUBLE) /
           (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)))
           AS BIGINT) AS salt_factor
       FROM s"""
}
