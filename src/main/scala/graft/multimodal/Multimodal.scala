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
        val entropy = hist.filter(_ > 0).map { c =>
          val p = c / n; -p * math.log(p) / math.log(2.0)
        }.sum
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
    * features (rows-only — the stub codec is engine-native by design;
    * the pooling invariants are pinned in OperatorSpec). */
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
}
