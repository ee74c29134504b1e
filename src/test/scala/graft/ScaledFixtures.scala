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
}
