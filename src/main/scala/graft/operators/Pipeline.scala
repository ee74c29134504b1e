package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline compositions (north star): the
  * decision operators a corpus-cleaning job actually ships, built by
  * composing the dedup / text / vector modules. */
object Pipeline {

  /** Corpus dedup decision list: a document is dropped iff it is the
    * higher-id member of a near-duplicate pair (n-gram Jaccard ≥
    * threshold) or a later exact copy. Output: every doc with keep flag
    * and the id of the document it duplicates (null if kept).
    *
    * Scale: pair generation is the index-driven jaccardPairs; the final
    * anti-join is on doc_id (shuffle of ids only). Chained duplicates
    * collapse to the lowest-id keeper via min(). */
  def dedupDecisions(documents: DataFrame, threshold: Double = 0.5)
      : DataFrame = {
    val pairs = graft.dedup.Dedup.jaccardPairs(documents, threshold = threshold)
    val dropped = pairs
      .groupBy(col("doc_b").as("doc_id"))
      .agg(min(col("doc_a")).as("dup_of"))
    documents
      .join(dropped, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        col("dup_of").isNull.as("keep"),
        col("dup_of"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark-contamination scan: which documents contain any of the
    * probe strings (e.g. eval-set n-grams), counted per source. The probe
    * list is tiny and becomes a literal array — at scale it would be a
    * broadcast join against an Aho-Corasick-style matcher; `contains` on
    * a handful of probes keeps it codegen'd. */
  def contaminationScan(documents: DataFrame,
      probes: Seq[String] = Seq("spark table scan", "window batch stream"))
      : DataFrame = {
    val hit = probes.map(p => col("text").contains(p).cast("int"))
      .reduce(_ + _) > 0
    documents
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(hit.cast("long")).as("n_contaminated"))
      .orderBy(col("source"))
  }

  /** Deterministic train/val/test split assignment: bucket each document
    * by the first hex digit of md5(doc_id) — stable across runs, engines,
    * and cluster sizes (the property random sampling lacks), so the split
    * never leaks when the pipeline is re-run. 12/16 train, 2/16 val,
    * 2/16 test. */
  def splitAssignments(documents: DataFrame): DataFrame = {
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 1)
    documents
      .withColumn("split",
        when(bucket.isin("0", "1", "2", "3", "4", "5", "6", "7", "8",
          "9", "a", "b"), "train")
          .when(bucket.isin("c", "d"), "val")
          .otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"), col("split"))
  }

  /** Per-language deterministic corpus sample via the custom
    * TypedImperativeAggregate (BottomKByHash): same k ids regardless of
    * partitioning, run, or engine — differential-tested against DuckDB's
    * ordered array_agg. The id list is serialized to a CSV string so the
    * comparison harness (pandas sort+hash) can treat it as a scalar. */
  def corpusSample(documents: DataFrame, k: Int = 5): DataFrame =
    documents
      .groupBy(col("lang"))
      .agg(array_join(
        graft.functions.SampleAggregates
          .bottomKByHash(col("doc_id"), k).cast("array<string>"), ",")
        .as("sample_ids"))
      .orderBy(col("lang"))

  /** Per-vector int8 quantization (min/max affine, the standard embedding
    * compression step): emits the scale parameters and the quantized
    * vector. Pure per-row arithmetic — narrow, codegen'd, no shuffle. The
    * quantized array is serialized to a CSV string so the comparison
    * harness (pandas sort+hash) can treat it as a scalar; q8_sum stays as
    * an independent integer checksum. */
  def quantizeEmbeddings(embeddings: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val lo = array_min(v)
    val hi = array_max(v)
    val q = transform(v, x =>
      round((x - array_min(v)) / (array_max(v) - array_min(v)) * 255)
        .cast("int"))
    embeddings
      .filter(col("vec_id") < 100)
      .select(
        col("vec_id"),
        lo.as("min_val"),
        hi.as("max_val"),
        array_join(q.cast("array<string>"), ",").as("q8"),
        aggregate(q, lit(0L), (acc, x) => acc + x).as("q8_sum"))
      .orderBy(col("vec_id"))
  }
}
