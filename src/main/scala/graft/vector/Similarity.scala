package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search over the `embeddings` fixture table
  * (`vec_id, embedding: array<float> dim=64, label`).
  *
  * All vector math uses higher-order functions (`zip_with`/`aggregate`) on
  * arrays cast to double — native Catalyst expressions, sequential
  * per-row folds (deterministic), no UDFs.
  *
  * Scale design:
  *  - Brute-force top-k is the correctness baseline: broadcast the query
  *    vectors (tiny) against the corpus — one scan, per-partition top-k via
  *    window row_number, no corpus shuffle. Linear in corpus size.
  *  - The scale path is bucketed ANN: a random-hyperplane LSH signature
  *    (SRP) assigns each vector to a bucket; queries probe only their own
  *    bucket → cost drops from O(N) to O(N/2^bits) per query. The bucket
  *    id doubles as a partitioning/bucketing key on disk at 100 TB.
  *  - IVF-style variant: coarse centroids = per-label means (stand-in for
  *    k-means, which would be an offline job); queries probe the nearest
  *    centroid's inverted list only.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine via the native codegen expression (graft.functions
    * .CosineSimilarity) — same sequential double fold as the HOF form
    * (`dot(a,b)/(norm(a)*norm(b))`), so results are bit-identical, but
    * ~3-5× faster on the candidate-pair hot paths. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Pairwise cosine between a small set of vectors (vec_id < bound) —
    * deterministic per-row fold, oracle-checkable with rounding. */
  def pairwiseCosine(embeddings: DataFrame, bound: Int = 10): DataFrame = {
    val small = embeddings.filter(col("vec_id") < bound)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    small.as("a").join(small.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        round(cosine(col("a.v"), col("b.v")), 3).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Brute-force exact top-k neighbors for each of `nQueries` query
    * vectors: broadcast queries × corpus scan, per-query top-k. */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    corpus
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("q"), col("v")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 3).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Quantized-scan kNN — the production memory-bound ANN pattern:
    * the corpus is scanned in its int8-reconstructed form (4 bytes→1
    * byte per dim in storage; here the reconstruction is computed from
    * the same affine code as Pipeline.quantizeEmbeddings), a coarse
    * top-`rerank` per query is taken on quantized cosines, and only the
    * survivors get the exact full-precision cosine + final top-k. At
    * 100 TB the coarse scan reads 1/4 the bytes and the exact pass
    * touches `rerank` vectors per query. All arithmetic (affine code,
    * reconstruct, cosine, HALF_UP rounding) is replicated in the DuckDB
    * oracle — fully oracle-checked end to end. */
  def quantizedTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10,
      rerank: Int = 30): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val lo = array_min(col("v"))
    val hi = array_max(col("v"))
    // Zero-range (constant) vectors reconstruct as identity: the affine
    // code would divide by (hi - lo) = 0 and poison the coarse score
    // with NaN. Mirrored in the DuckDB oracle.
    val recon = when(hi === lo, col("v")).otherwise(transform(col("v"), x =>
      lo + round((x - lo) / (hi - lo) * 255) / 255.0 * (hi - lo)))
    val coded = corpus.select(col("vec_id"), col("v"), recon.as("r"))
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("q"))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse").desc, col("vec_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    coded
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("coarse", round(cosine(col("q"), col("r")), 6))
      .withColumn("crank", row_number().over(wCoarse))
      .filter(col("crank") <= rerank)
      .withColumn("cos", round(cosine(col("q"), col("v")), 6))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 3).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64 of (plane, dim))
    * — exposed so the DuckDB oracle can embed the SAME constants and
    * reproduce the buckets exactly. */
  def srpPlanes(bits: Int, dim: Int = 64): Seq[Seq[Double]] = {
    def mix(z0: Long): Double = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      // map to [-1, 1)
      (z >>> 11).toDouble / 4503599627370496.0 - 1.0
    }
    (0 until bits).map(p => (0 until dim).map(d => mix(p.toLong * 131 + d)))
  }

  /** Signed-random-projection LSH bucket id (`bits` hyperplanes). */
  def srpBucket(v: Column, bits: Int = 8, dim: Int = 64): Column = {
    val planes = srpPlanes(bits, dim)
    val bitCols = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit(_)): _*)
      when(dot(v, planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate NN: queries probe only their own SRP bucket.
    * The bucket join is an equi-join on bucket id → hash-partitioned,
    * each bucket ~N/2^bits vectors. */
  def lshTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10,
      bits: Int = 6): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", srpBucket(col("v"), bits))
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("q"),
        col("bucket").as("qbucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    corpus
      .join(broadcast(queries),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("q"), col("v")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 3).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Multi-probe LSH ANN: each query probes its own SRP bucket PLUS every
    * Hamming-1 neighbor bucket (one hyperplane flipped). Near misses —
    * vectors on the far side of a single hyperplane — are recovered, so
    * recall rises roughly (bits+1)× the candidate volume at the same
    * index; the classic recall/cost dial for SRP indexes. */
  def lshTopKMultiProbe(embeddings: DataFrame, nQueries: Int = 5,
      k: Int = 10, bits: Int = 6): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", srpBucket(col("v"), bits))
    val probes = array((0 to bits).map(i =>
      if (i == 0) col("bucket")
      else col("bucket").bitwiseXOR(lit(1L << (i - 1)))): _*)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("q"),
        explode(probes).as("probe"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    corpus
      .join(broadcast(queries),
        col("bucket") === col("probe") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("q"), col("v")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 3).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style ANN: coarse centroids (per-label mean vectors — a
    * deterministic stand-in for offline k-means), each query probes its
    * `nprobe` nearest centroids' inverted lists (nprobe is the standard
    * IVF recall/cost dial; lists are disjoint so no dedup is needed).
    * Centroid assignment and probe are broadcast joins; the corpus is
    * scanned once. */
  /** Exact per-dimension mean vectors per cluster key (posexplode →
    * exact decimal sum / count → reassemble); exact so the centroids
    * (and every cosine to them) are oracle-reproducible, unlike
    * order-dependent avg(). */
  private def exactMeans(members: DataFrame, keyCol: String): DataFrame =
    members
      .select(col(keyCol), posexplode(col("v")))
      .groupBy(col(keyCol), col("pos"))
      .agg((sum(col("col").cast("decimal(28,12)")).cast("double") /
        count(lit(1)).cast("double")).as("m"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .getField("m").as("centroid"))

  def ivfTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10,
      nprobe: Int = 1): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val centroids = exactMeans(corpus.select(col("label"), col("v")), "label")
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("q"))
    // nearest centroid per query (tiny × tiny cross join)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("label"))
    val probe = queries.crossJoin(broadcast(centroids))
      .withColumn("ccos", cosine(col("q"), col("centroid")))
      .withColumn("r", row_number().over(wq))
      .filter(col("r") <= nprobe)
      .select(col("query_id"), col("q"), col("label").as("probe_label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    corpus
      .join(broadcast(probe),
        col("label") === col("probe_label") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("q"), col("v")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 3).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF with ONE k-means (Lloyd) refinement round: the per-label seed
    * centroids are refined by re-assigning every vector to its nearest
    * seed and recomputing exact means over the new clusters — the
    * iterative-ML shape (assign = cross join vs broadcast centroids;
    * re-mean = one exact-decimal aggregation) that a full k-means job
    * repeats to convergence. Queries then probe the refined index.
    * Every step is deterministic (exact-decimal means, fixed tie-breaks)
    * so the whole refinement is oracle-checked in SQL. */
  def ivfRefinedTopK(embeddings: DataFrame, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val seeds = exactMeans(corpus.select(col("label"), col("v")), "label")
    val wv = Window.partitionBy(col("vec_id"))
      .orderBy(col("scos").desc, col("label"))
    val assigned = corpus.select(col("vec_id"), col("v"))
      .crossJoin(broadcast(seeds))
      .withColumn("scos", cosine(col("v"), col("centroid")))
      .withColumn("r", row_number().over(wv))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("v"), col("label").as("cluster"))
    val refined = exactMeans(assigned.select(col("cluster"), col("v")),
      "cluster")
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("q"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cluster"))
    val probe = queries.crossJoin(broadcast(refined))
      .withColumn("ccos", cosine(col("q"), col("centroid")))
      .withColumn("r", row_number().over(wq))
      .filter(col("r") === 1)
      .select(col("query_id"), col("q"), col("cluster").as("probe_cluster"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    assigned
      .join(broadcast(probe),
        col("cluster") === col("probe_cluster") &&
          col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("q"), col("v")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 3).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** ANN index evaluation: per-query recall of the multi-probe LSH index
    * against the exact brute-force top-k — the in-engine metric that
    * justifies (or rejects) an index's recall/cost trade-off. Composes
    * two oracled queries, so the recall itself is oracle-checked. */
  def annRecall(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10,
      bits: Int = 6): DataFrame = {
    val brute = bruteForceTopK(embeddings, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val approx = lshTopKMultiProbe(embeddings, nQueries, k, bits)
      .select(col("query_id").as("aq"), col("vec_id").as("av"))
    brute
      .join(approx,
        col("query_id") === col("aq") && col("vec_id") === col("av"),
        "left_outer")
      .groupBy(col("query_id"))
      .agg((count(col("av")).cast("double") / lit(k.toDouble)).as("recall"))
      .orderBy(col("query_id"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * restricted to LSH-bucket candidates (the scalable near-dup shape). */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double = 0.9,
      bits: Int = 8): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", srpBucket(col("v"), bits))
    corpus.as("a")
      .join(corpus.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(col("cos"), 3).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
