package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.vector.Similarity

/** Deep scale gate for the ANN/IVF family (r14 VERDICT item 4): the
  * dedup, graph, and streaming families carry 64×–1024× invariant
  * gates; similarity had oracled correctness (sf0.01) + the 8× blanket
  * only. This tool certifies the TRAINED-quantizer IVF path
  * (`q_knn_ivf_trained` / `q_ann_recall_ivf` machinery) on a k×-grown
  * embedding corpus — `ScaledFixtures.jitteredEmbeddings`, so copies
  * are genuinely new points — by properties a wrong index cannot fake,
  * with every ground truth computed IN-ENGINE (brute force is linear
  * per query; no external oracle needed at any k):
  *
  *  1. `partition_exact` — the inverted lists are a PARTITION of the
  *     corpus: every vector in exactly one list (count + distinct).
  *  2. `assignment_optimal` — every vector sits in the list of its
  *     d²-NEAREST trained centroid (violations = vectors whose own
  *     centroid is strictly farther than some other centroid; checked
  *     with an independent min-over-all-centroids expression, not the
  *     assignment code path).
  *  3. `full_probe_equals_brute` — serving with nprobe = #lists must
  *     reproduce exact brute-force top-k ROW-FOR-ROW (rank, cos): an
  *     exhaustive probe of a correct partition IS a full scan.
  *  4. `recall_monotone` — per-query recall@k is non-decreasing in
  *     nprobe (candidate lists grow by superset; a brute-truth member
  *     can never fall OUT of the approx top-k once its list is
  *     probed — see the proof in the check's comment).
  *  5. `recall_floor` — mean recall@k at nprobe=2 (the catalog's
  *     published operating point) must hold the floor across k: the
  *     bucketed-inverted-list claim is that recall is a property of
  *     (index geometry, probe budget), NOT of corpus size.
  *
  * Also recorded (SCALING.md feeds): the full recall curve at nprobe
  * 1/2/4/#lists, inverted-list skew (min/mean/max members — the
  * probe-list balance a 100 TB serving fleet shards by), and peak
  * per-task execution memory (the flat-in-k claim).
  *
  * Run:  sbt "Test/runMain graft.AnnScaleGate 64"
  * args: [k] [outDir] [recallFloorNp2] [nQueries]
  * Base fixtures from SPARK_GRAFT_SF_DIR (default sf0.1: 2000 × 64-dim
  * float vectors, 10 labels ⇒ 10 trained lists).
  */
object AnnScaleGate {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(64)
    val outDir = if (args.length > 1) args(1)
      else s"/tmp/graft_ann_gate_$k"
    // floor pinned from the 64× measurement (mean recall@10 at
    // nprobe=2 = 1.000 after the final-means index fix; 0.95 leaves
    // margin for jitter-density variation across k — SCALING.md §ANN
    // gate). Override with arg 3 to re-measure.
    val recallFloor = if (args.length > 2) args(2).toDouble else 0.95
    val nQueries = if (args.length > 3) args(3).toInt else 20
    val kTop = 10
    val rounds = 2 // the catalog's q_knn_ivf_trained training depth
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val shuffleParts = math.min(2048, math.max(32, k * 4))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffleParts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.rdd.compress", "true")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // peak per-task execution memory across the whole gate — the
    // flat-in-k number SCALING.md tracks for every family
    val peakTaskMem = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null)
            peakTaskMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
        }
      })

    // ---- build the jittered k× corpus once per (base, k) ----
    val tablesDir = s"$outDir/tables"
    val marker = Paths.get(s"$tablesDir/_built_embeddings")
    val spec = s"base=$base k=$k jitter=0.01"
    if (!Files.exists(marker) || Files.readString(marker).trim != spec) {
      val raw = Tables.raw(spark, base, "embeddings")
      ScaledFixtures.jitteredEmbeddings(raw, k)
        .write.mode("overwrite").parquet(s"$tablesDir/embeddings.parquet")
      Files.writeString(marker, spec)
      println(s"ANNGATE built embeddings x$k")
    } else println(s"ANNGATE reusing tables at $tablesDir ($spec)")

    val emb = spark.read.parquet(s"$tablesDir/embeddings.parquet")
    val corpus = emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .persist()
    val nVec = corpus.count()
    println(s"ANNGATE corpus n=$nVec (k=$k)")

    val results = scala.collection.mutable.ArrayBuffer[String]()
    var failures = 0
    def check(name: String, ok: Boolean, detail: String): Unit = {
      if (!ok) failures += 1
      println(s"ANNGATE CHECK $name ${if (ok) "PASS" else "FAIL"} $detail")
      results += s""""$name":{"pass":${ok},"detail":"$detail"}"""
    }

    // ---- train (the catalog path: 2 Lloyd rounds over label seeds) ----
    val t0 = System.nanoTime()
    val (assignedRaw, cent) = Similarity.trainQuantizer(corpus, rounds)
    val assigned = assignedRaw.persist()
    val trainSec = (System.nanoTime() - t0) / 1e9
    val nLists = cent.length
    import spark.implicits._
    val mDf = cent.toDF("cluster", "centroid")
    println(f"ANNGATE trained rounds=$rounds lists=$nLists in $trainSec%.1f s")

    // ---- 1. the inverted lists partition the corpus ----
    val aCount = assigned.count()
    val aDistinct = assigned.select(col("vec_id")).distinct().count()
    check("partition_exact", aCount == nVec && aDistinct == nVec,
      s"list_rows=$aCount distinct=$aDistinct corpus=$nVec")

    // ---- list skew (recorded; the serving-shard balance number) ----
    val sizes = assigned.groupBy(col("cluster")).count()
      .agg(min(col("count")), max(col("count")),
        avg(col("count"))).head()
    val (szMin, szMax, szMean) =
      (sizes.getLong(0), sizes.getLong(1), sizes.getDouble(2))
    println(f"ANNGATE lists min=$szMin max=$szMax mean=$szMean%.0f " +
      f"skew=${szMax / szMean}%.2f")

    // ---- 2. every vector in its d2-nearest centroid's list ----
    // independent expression: min over ALL centroids vs own centroid
    val centArr = array(cent.map { case (c, m) =>
      struct(typedLit(m).as("m"), lit(c).as("cl")) }: _*)
    val dOwn = Similarity.dist2(col("v"),
      element_at(map_from_arrays(
        array(cent.map(c => lit(c._1)): _*),
        array(cent.map(c => typedLit(c._2)): _*)), col("cluster")))
    val dMin = array_min(transform(centArr,
      e => Similarity.dist2(col("v"), e.getField("m"))))
    val notNearest = assigned
      .withColumn("d_own", dOwn).withColumn("d_min", dMin)
      .filter(col("d_own") > col("d_min")).count()
    check("assignment_optimal", notNearest == 0,
      s"vectors_not_in_nearest_list=$notNearest of $nVec")

    // ---- brute-force ground truth, in-engine (linear per query) ----
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("q"))
    val brute = corpus
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(Similarity.cosine(col("q"), col("v")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 3).as("cos"))
      .localCheckpoint(true)

    // ---- 3. exhaustive probe == brute force, row-for-row ----
    val full = Similarity.serveTrained(corpus, assigned, mDf,
      nQueries, kTop, nprobe = nLists)
    val fullDiff = full.exceptAll(brute).count() +
      brute.exceptAll(full).count()
    check("full_probe_equals_brute", fullDiff == 0,
      s"row_diff=$fullDiff at nprobe=$nLists (queries=$nQueries k=$kTop)")

    // ---- 4./5. recall curve, monotonicity, floor ----
    val bruteIds = brute.select(col("query_id"), col("vec_id"))
    def recallAt(np: Int): Map[Long, Double] = {
      val approx = Similarity.serveTrained(corpus, assigned, mDf,
          nQueries, kTop, np)
        .select(col("query_id").as("aq"), col("vec_id").as("av"))
      bruteIds.join(approx,
          col("query_id") === col("aq") && col("vec_id") === col("av"),
          "left_outer")
        .groupBy(col("query_id"))
        .agg((count(col("av")).cast("double") / lit(kTop.toDouble))
          .as("recall"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val probes = (Seq(1, 2, 4).filter(_ < nLists) :+ nLists).distinct
    val curve = probes.map(np => np -> recallAt(np))
    curve.foreach { case (np, m) =>
      val vals = m.values.toSeq
      println(f"ANNGATE recall nprobe=$np mean=${vals.sum / vals.size}%.3f " +
        f"min=${vals.min}%.3f")
      results += s""""recall_np$np":{"mean":${vals.sum / vals.size},""" +
        s""""min":${vals.min}}"""
    }
    // per-query monotone: a brute-truth member, once its list is
    // probed, is outranked only by candidates that also outrank it in
    // the FULL corpus — and fewer than kTop of those exist for a
    // top-k member — so it can never fall back out as nprobe grows
    val monoViolations = curve.sliding(2).map { case Seq((_, lo), (_, hi)) =>
      lo.count { case (q, r) => hi(q) < r - 1e-12 }
    }.sum
    check("recall_monotone", monoViolations == 0,
      s"per-query decreases across ${probes.mkString("/")}=$monoViolations")
    val np2 = curve.find(_._1 == 2).orElse(curve.lastOption).get._2
    val np2Mean = np2.values.sum / np2.size
    check("recall_floor", np2Mean >= recallFloor,
      f"mean_recall@$kTop nprobe=2 = $np2Mean%.3f floor=$recallFloor " +
        s"(n=$nVec)")

    val fullRecallJson = curve.map { case (np, m) =>
      f"${m.values.sum / m.size}%.4f" }.mkString("[", ",", "]")
    val json =
      s"""{"k":$k,"n_vec":$nVec,"lists":$nLists,"rounds":$rounds,""" +
      s""""train_sec":${f"$trainSec%.1f"},""" +
      s""""list_min":$szMin,"list_max":$szMax,""" +
      s""""list_mean":${f"$szMean%.1f"},""" +
      s""""probes":[${probes.mkString(",")}],""" +
      s""""recall_means":$fullRecallJson,""" +
      s""""peak_task_mem_mb":${peakTaskMem.get() / 1000000},""" +
      results.mkString("", ",", "}")
    Files.writeString(Paths.get(s"$outDir/ann_gate.json"), json)
    println(s"ANNGATE done failures=$failures -> $outDir/ann_gate.json")
    corpus.unpersist(); assigned.unpersist()
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
