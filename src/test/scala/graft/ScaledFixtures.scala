package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared builders for the k×-scaled probe corpora (ScalingProbe /
  * ProfileScaled): id-shifted copies; document text salted PER WORD
  * with the copy index so copies are genuinely new content (disjoint
  * vocabulary) while each copy keeps the fixture's own near-dup
  * structure — the one-word salt variant measured the adversarial
  * all-duplicates case instead (611× pairs at 8×, r8). */
object ScaledFixtures {
  val idShift = 10000000L

  def scaled(df: DataFrame, k: Int, idCols: Seq[String]): DataFrame =
    (0 until math.max(k, 1)).map { c =>
      var d = df
      idCols.foreach(ic => d = d.withColumn(ic, col(ic) + lit(c * idShift)))
      d
    }.reduce(_ unionAll _)

  /** k× documents with per-word copy salting. */
  def saltedDocs(docs: DataFrame, k: Int): DataFrame =
    scaled(docs, k, Seq("doc_id"))
      .withColumn("text",
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("x"),
            (col("doc_id") / lit(idShift)).cast("long"))), " "))

  /** k× embeddings with deterministic per-(vector, dimension) jitter
    * (ε ∈ [−jitter, jitter] from xxhash64(vec_id, dim)) — copies
    * become genuinely NEW points that keep the base corpus's cluster
    * structure, the saltedDocs convention for the vector family: plain
    * id-shifted copies would gate the adversarial all-exact-duplicates
    * case (every cosine a tie) instead of a grown corpus. Applied to
    * copy 0 too, so the whole gated corpus is one uniform
    * distribution; ground truth is computed in-engine, never against
    * the unjittered base. `jitter` is the amplitude knob the ANN gate
    * raises until the nprobe=1 operating point sits strictly below
    * 1.0 recall — a corpus whose true neighbors never straddle a list
    * boundary cannot exercise a recall floor (r15 VERDICT item 1). */
  def jitteredEmbeddings(emb: DataFrame, k: Int,
      jitter: Double = 0.01): DataFrame =
    scaled(emb, k, Seq("vec_id"))
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x.cast("double") +
            (pmod(xxhash64(col("vec_id"), i), lit(2001L)).cast("double") -
              lit(1000.0)) / lit(1000.0) * lit(jitter)).cast("float")))

  /** Relabel an embedding frame with 2^planes sign-random-projection
    * buckets (Charikar's SRP — the deterministic, locality-sensitive
    * grouping): label = Σ_j [v·h_j > 0]·2^j over fixed pseudo-random
    * hyperplanes h_j. The trained-quantizer path seeds one centroid
    * per label, so this is how the ANN gate makes nlist a FUNCTION OF
    * CORPUS SIZE (nlist ≈ 2^⌈log₂√N⌉) instead of the fixture's 10
    * labels — SRP orthants have genuinely distinct means, so the seeds
    * spread where a hash-mod relabel would collapse every seed onto
    * the global mean. Map-only; empty orthants simply yield no seed. */
  def srpRelabel(emb: DataFrame, planes: Int, dims: Int = 64): DataFrame = {
    require(planes >= 1 && planes <= 30, s"planes out of range: $planes")
    val label = (0 until planes).map { j =>
      val h: Seq[Double] = (0 until dims).map { d =>
        val u = ((scala.util.hashing.MurmurHash3
          .productHash((j, d)) % 2001) + 2001) % 2001
        (u - 1000) / 1000.0
      }
      val dot = aggregate(
        zip_with(col("embedding").cast("array<double>"), typedLit(h),
          (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    emb.withColumn("label", label.cast("int"))
  }
}
