package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence probe (dev tool, like ProfileQ): times representative
  * operators at up to 64× scaled copies of the sf0.1 fixtures, so the
  * "linear in the corpus" claims in SURVEY rest on measurements instead
  * of assertions. Copies are id-shifted; text copies are salted with the
  * copy index so near-dup candidate structure stays realistic (exact
  * duplicate blowup across copies would measure the adversarial
  * quadratic case, not scaling).
  *
  * Run: sbt "Test/runMain graft.ScalingProbe"   (~5 min)
  * Output: one PROBE line per (operator, scale) with rows and seconds.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    def scaled(df: DataFrame, k: Int, idCols: Seq[String],
        saltText: Boolean): DataFrame = {
      val n = 10000000L
      (0 until k).map { c =>
        var d = df
        idCols.foreach(ic =>
          d = d.withColumn(ic, col(ic) + lit(c * n)))
        if (saltText && d.columns.contains("text"))
          d = d.withColumn("text",
            concat(col("text"), lit(" copyword" + c)))
        d
      }.reduce(_ unionAll _)
    }

    // k = 0 marks the untimed codegen/JIT warmup pass so the curve
    // measures data scaling, not first-compile cost
    def time(op: String, k: Int)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      if (k > 0) println(f"PROBE op=$op scale=$k rows=$rows sec=$dt%.2f")
    }

    val events = Tables.load(spark, sfDir, "events")
    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    val orders = Tables.load(spark, sfDir, "orders")

    for (k <- Seq(0, 1, 8, 64)) {
      val ev = scaled(events, math.max(k, 1),
        Seq("event_id", "user_id"), saltText = false)
        .persist()
      ev.count()
      // grouped aggregation (map-side partial -> tiny shuffle)
      time("agg_by_type", k) {
        ev.groupBy(col("event_type"))
          .agg(count(lit(1)), sum(col("value"))).count()
      }
      // sessionization (partitioned window over user)
      time("sessionize", k) {
        operators.EventsPipeline.sessionize(ev).count()
      }
      // custom broadcast range join: fixed 12-band dim broadcast, fact
      // side probes in place — must stay scan-bound (near-linear)
      time("range_bands", k) {
        operators.EventsPipeline.rangeBandCounts(ev).count()
      }
      ev.unpersist()
    }

    for (k <- Seq(0, 1, 8, 32)) {
      val li = scaled(lineitem, math.max(k, 1), Seq("l_orderkey"),
        saltText = false).persist()
      val ord = scaled(orders, math.max(k, 1), Seq("o_orderkey", "o_custkey"),
        saltText = false).persist()
      li.count(); ord.count()
      // fact-fact shuffle join at growing both-side scale
      time("join_priority", k) {
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1))).count()
      }
      li.unpersist(); ord.unpersist()
    }

    for (k <- Seq(0, 1, 8, 64)) {
      val d = scaled(docs, math.max(k, 1), Seq("doc_id"), saltText = true)
        .persist()
      d.count()
      // shingle explosion + signature build (the dedup workhorse)
      time("minhash_sigs", k) {
        graft.dedup.Dedup.minhashSignatures(d).count()
      }
      // vocab-grain BPE token accounting
      time("bpe_token_stats", k) {
        graft.text.TextAnalysis.bpeTokenStats(d).count()
      }
      // bigram-grain PMI collocation mining
      time("pmi", k) {
        graft.text.TextAnalysis.pmiCollocations(d).count()
      }
      d.unpersist()
    }

    for (k <- Seq(0, 1, 16, 64)) {
      val e = scaled(emb, math.max(k, 1), Seq("vec_id"), saltText = false)
        .persist()
      e.count()
      // one-pass Gram moment accumulation (PCA corpus pass)
      time("gram_moments", k) {
        e.select(transform(col("embedding").cast("array<double>"),
            x => round(x * 1000000d).cast("long")).as("xq"))
          .agg(functions.GramAggregate.gramMoments(col("xq"), 64))
          .head().getSeq[Long](0).length.toLong
      }
      // zero-shuffle per-row JL projection folds
      time("rand_proj", k) {
        vector.Similarity.randomProjection(e).count()
      }
      // Gram-identity mean pairwise dot (pair-join-free)
      time("mean_pairwise", k) {
        vector.Similarity.meanPairwiseDot(e).count()
      }
      // SemDeDup under size-derived sub-blocking: clusters grow with
      // the corpus (labels are fixed) but per-block pair cost is
      // capped, so the curve must stay linear-ish — the r7 verdict's
      // one open scale question
      time("semdedup", k) {
        vector.Similarity.semDedup(e, threshold = 0.35).count()
      }
      e.unpersist()
    }

    // Heavy dedup family (last: the most expensive rows). The one-word
    // salt above is far too weak here — a single appended word leaves
    // cross-copy Jaccard ≈ 0.98, so every copy of a doc pairs with
    // every other copy and the probe measures the adversarial
    // all-duplicates case (first run: 611× pairs at 8×), not corpus
    // growth. Salting EVERY word gives copies disjoint vocabulary —
    // genuinely new content, the scaling scenario — while each copy
    // keeps the fixture's own realistic near-dup structure.
    for (k <- Seq(0, 1, 8, 64)) {
      val base = scaled(docs, math.max(k, 1), Seq("doc_id"),
        saltText = false)
      val d = base.withColumn("text",
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("x"),
            (col("doc_id") / lit(10000000L)).cast("long"))), " "))
        .persist()
      d.count()
      // PPJoin prefix-filtered Jaccard — the heaviest catalog member
      time("jaccard_prefix", k) {
        graft.dedup.Dedup.jaccardPrefixPairs(d).count()
      }
      // near-dup connected-components fixpoint + canonical selection
      time("cluster_canonical", k) {
        operators.Pipeline.clusterCanonical(d).count()
      }
      // stride-indexed windowed substring dedup
      time("substring_dedup", k) {
        graft.dedup.Dedup.substringDedup(d).count()
      }
      d.unpersist()
    }

    spark.stop()
  }
}
