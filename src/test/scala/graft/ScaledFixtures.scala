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
    * (ε ∈ [−0.01, 0.01] from xxhash64(vec_id, dim)) — copies become
    * genuinely NEW points that keep the base corpus's cluster
    * structure, the saltedDocs convention for the vector family: plain
    * id-shifted copies would gate the adversarial all-exact-duplicates
    * case (every cosine a tie) instead of a grown corpus. Applied to
    * copy 0 too, so the whole gated corpus is one uniform
    * distribution; ground truth is computed in-engine, never against
    * the unjittered base. */
  def jitteredEmbeddings(emb: DataFrame, k: Int): DataFrame =
    scaled(emb, k, Seq("vec_id"))
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x.cast("double") +
            (pmod(xxhash64(col("vec_id"), i), lit(2001L)).cast("double") -
              lit(1000.0)) / lit(1000.0) * lit(0.01)).cast("float")))
}
