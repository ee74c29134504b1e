package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder-spec north star): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed in
  * batch-friendly per-partition passes.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (`StubCodec`) — but the Spark-side
  * plumbing is real and is what matters at scale: schema, partition-sized
  * batching, and the per-partition map that a native decoder (or an Arrow
  * `mapInPandas` in PySpark) would plug into.
  *
  * Scale notes: payload bytes never shuffle — feature extraction happens
  * in the same stage as the scan (narrow `mapPartitions`), and only the
  * small typed feature structs flow to downstream joins/aggregations.
  * `spark.sql.files.maxPartitionBytes` bounds decoded batch memory.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  case class MediaMeta(mediaType: String, width: Int, height: Int,
      sampleRateHz: Int, nBytes: Long)

  case class MediaRecord(mediaId: Long, payload: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(mediaId: Long, mediaType: String, nBytes: Long,
      meanByte: Double, byteEntropyMilli: Long, frameCount: Int)

  /** Deterministic fake codec — stands in for libjpeg/ffmpeg/etc.
    * Real deployments replace `decode` with a native library call; the
    * signature (bytes in, fixed-shape frame batch out) is the contract. */
  object StubCodec {
    /** STUB: "decodes" a payload into n 8x8 grayscale frames derived from
      * the bytes themselves — deterministic, codec-free. */
    def decode(payload: Array[Byte], frames: Int): Array[Array[Int]] =
      Array.tabulate(frames)(f =>
        Array.tabulate(64)(i => payload(((f * 64 + i) % math.max(payload.length, 1))) & 0xFF))
  }

  /** Build a media table from the documents fixture: each document's text
    * bytes play the payload role (deterministic, derived from testdata). */
  def mediaTable(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id").as("mediaId"),
        col("text").cast("binary").as("payload"),
        struct(
          concat(lit("image/stub-"), col("lang")).as("mediaType"),
          lit(8).as("width"),
          lit(8).as("height"),
          lit(0).as("sampleRateHz"),
          length(col("text")).cast("long").as("nBytes")).as("meta"))
      .as[MediaRecord]
  }

  /** Per-partition feature extraction: the decode → featurize hot loop a
    * real pipeline runs per batch. Narrow transformation (no shuffle). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord],
      frames: Int = 4): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val decoded = StubCodec.decode(rec.payload, frames)
        val all = decoded.flatten
        val mean = if (all.isEmpty) 0.0 else all.sum.toDouble / all.length
        val hist = new Array[Long](256)
        all.foreach(b => hist(b) += 1)
        val n = math.max(all.length, 1).toDouble
        // entropy terms quantized to scale 12 and summed EXACTLY (the
        // decSum convention): a plain double sum is addition-order-
        // dependent, and the DuckDB oracle's sum() carries no order —
        // the exact-decimal reduction is what makes the compare
        // order-free on both sides
        var eSum = java.math.BigDecimal.ZERO
        var b = 0
        while (b < 256) {
          val c = hist(b)
          if (c > 0) {
            val p = c / n
            eSum = eSum.add(
              java.math.BigDecimal.valueOf(-p * math.log(p) / math.log(2.0))
                .setScale(12, java.math.RoundingMode.HALF_UP))
          }
          b += 1
        }
        val entropy = eSum.doubleValue
        MediaFeatures(rec.mediaId, rec.meta.mediaType, rec.meta.nBytes,
          mean, math.round(entropy * 1000), decoded.length)
      }
    }
  }

  case class FrameFeatures(mediaId: Long, frameIdx: Int, meanMilli: Long,
      pooledW: Int, pooledH: Int, pooledMeanMilli: Long)

  /** 2×2 average-pool "resize" of an 8×8 frame to 4×4 — the integer
    * stand-in for a real resampler (bilinear/lanczos plug in here with
    * the same shape contract: W×H ints in, (W/2)×(H/2) ints out). */
  def pool2x2(frame: Array[Int], w: Int = 8, h: Int = 8): Array[Int] =
    Array.tabulate((h / 2) * (w / 2)) { p =>
      val (r, c) = (p / (w / 2) * 2, p % (w / 2) * 2)
      (frame(r * w + c) + frame(r * w + c + 1) +
        frame((r + 1) * w + c) + frame((r + 1) * w + c + 1)) / 4
    }

  /** Uniform frame sampling: `take` of `total` frames by integer index
    * arithmetic (frame i·total/take — the ffmpeg `select` idiom),
    * deterministic and order-stable. */
  def sampleFrameIdx(total: Int, take: Int): Seq[Int] =
    (0 until take).map(i => i * total / take)

  /** Frame-level pipeline: decode → frame-sample → resize → per-frame
    * features, all inside one narrow mapPartitions (payload bytes never
    * leave the scan stage; only small per-frame feature rows flow on).
    * Integer milli-means, so results are bit-stable across engines and
    * partitionings. */
  def frameFeatures(spark: SparkSession, media: Dataset[MediaRecord],
      totalFrames: Int = 8, sampleN: Int = 3): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { rec =>
        val decoded = StubCodec.decode(rec.payload, totalFrames)
        sampleFrameIdx(totalFrames, sampleN).map { fi =>
          val frame = decoded(fi)
          val pooled = pool2x2(frame)
          FrameFeatures(rec.mediaId, fi,
            math.round(frame.map(_.toLong).sum * 1000.0 / frame.length),
            4, 4,
            math.round(pooled.map(_.toLong).sum * 1000.0 / pooled.length))
        }
      }
    }
  }

  /** Driver-facing frame pipeline: per-media roll-up of sampled-frame
    * features, exactly oracled by [[framePipelineOracleSql]] (pooling
    * invariants additionally pinned in OperatorSpec). */
  def framePipeline(spark: SparkSession, documents: DataFrame): DataFrame = {
    val ff = frameFeatures(spark, mediaTable(spark, documents))
    ff.toDF()
      .groupBy(col("mediaId"))
      .agg(count(lit(1)).as("n_frames_sampled"),
        sum(col("meanMilli")).as("sum_mean_milli"),
        sum(col("pooledMeanMilli")).as("sum_pooled_milli"))
      .orderBy(col("mediaId"))
  }

  /** SQL-expressible byte-level metadata stats (oracle-checkable): payload
    * sizes per media type — the pure-relational face of the media table. */
  def payloadStats(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        concat(lit("image/stub-"), col("lang")).as("media_type"),
        length(col("text").cast("binary")).as("n_bytes"))
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy(col("media_type"))

  /** Full stub pipeline as a DataFrame (for the driver harness):
    * mediaTable → mapPartitions featurize → per-type aggregate. */
  def featurePipeline(spark: SparkSession, documents: DataFrame): DataFrame = {
    val feats = extractFeatures(spark, mediaTable(spark, documents))
    feats.toDF()
      .groupBy(col("mediaType"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("byteEntropyMilli")).as("sum_entropy_milli"),
        sum(col("frameCount")).as("total_frames"))
      .orderBy(col("mediaType"))
  }

  // -------------------------------------------------------------------
  // DuckDB oracles: StubCodec.decode is deterministic integer
  // arithmetic over the payload bytes, and the fixture text is pure
  // ASCII — a CONTENT precondition the schema contract can't see, so
  // FixtureContractSpec's "documents.text is pure ASCII" canary pins it
  // by counting octet_length != length rows. While it holds, byte p of
  // the payload is ascii(substring(text, p+1, 1)) — fully replayable in
  // SQL, the bpeTrain / z-value bit-interleave precedent.
  // -------------------------------------------------------------------

  /** Oracle for [[featurePipeline]]: the 4-frame decode visits payload
    * bytes (0..255) % len; entropy over that 256-value histogram uses
    * the identical -(c/256)·ln(c/256)/ln(2) term per bucket (dyadic p,
    * so both engines feed ln the same double; the ≤1-ulp libm noise is
    * 1e-13 against the 5e-4 milli-rounding granularity), each term
    * quantized to DECIMAL(28,12) and summed exactly so neither engine's
    * aggregation ORDER can move the sum (the decSum convention). */
  def featurePipelineOracleSql: String =
    """WITH d AS (
         SELECT doc_id, 'image/stub-' || lang AS "mediaType", text,
           octet_length(encode(text)) AS len
         FROM documents),
       b AS (
         SELECT doc_id, "mediaType",
           ascii(substring(text, CAST(p % len AS INTEGER) + 1, 1)) AS v
         FROM d, (SELECT unnest(range(256)) AS p)),
       h AS (
         SELECT doc_id, "mediaType", v, count(*) AS c
         FROM b GROUP BY 1, 2, 3),
       ent AS (
         SELECT doc_id, "mediaType",
           CAST(round(CAST(sum(CAST(-(c / 256.0) * ln(c / 256.0) / ln(2.0)
               AS DECIMAL(28,12))) AS DOUBLE) * 1000)
             AS BIGINT) AS em
         FROM h GROUP BY 1, 2)
       SELECT "mediaType", count(*) AS n_items,
         CAST(sum(em) AS BIGINT) AS sum_entropy_milli,
         CAST(count(*) * 4 AS BIGINT) AS total_frames
       FROM ent GROUP BY 1 ORDER BY 1"""

  /** Oracle for [[framePipeline]]: sampled frames {0,2,5} (= i·8/3),
    * frame f's 64 bytes at (f·64+i) % len, the same truncating-divide
    * 2×2 pool, and milli-means as pure integers — math.round(S·1000/64)
    * on a dyadic-exact double equals (S·1000+32)//64, so no float
    * enters the compare at all. */
  def framePipelineOracleSql: String =
    """WITH d AS (
         SELECT doc_id, text, octet_length(encode(text)) AS len
         FROM documents),
       fr AS (SELECT doc_id, text, len, unnest([0, 2, 5]) AS f FROM d),
       px AS (
         SELECT doc_id, f,
           list_transform(range(0, 64), i ->
             ascii(substring(text,
               CAST((f * 64 + i) % len AS INTEGER) + 1, 1))) AS frame
         FROM fr),
       m AS (
         SELECT doc_id, f,
           (list_sum(frame) * 1000 + 32) // 64 AS mean_milli,
           (list_sum(list_transform(range(0, 16), p ->
              (frame[(p // 4) * 16 + (p % 4) * 2 + 1]
               + frame[(p // 4) * 16 + (p % 4) * 2 + 2]
               + frame[(p // 4) * 16 + (p % 4) * 2 + 9]
               + frame[(p // 4) * 16 + (p % 4) * 2 + 10]) // 4))
            * 1000 + 8) // 16 AS pooled_milli
         FROM px)
       SELECT doc_id AS "mediaId", count(*) AS n_frames_sampled,
         CAST(sum(mean_milli) AS BIGINT) AS sum_mean_milli,
         CAST(sum(pooled_milli) AS BIGINT) AS sum_pooled_milli
       FROM m GROUP BY 1 ORDER BY 1"""
}
