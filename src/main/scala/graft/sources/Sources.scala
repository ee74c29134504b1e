package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink formats beyond the fixture Parquet (SURVEY.md §2.1:
  * reference speaks JSON-over-Kafka + BSON; we add Parquet, JSON lines,
  * CSV — all Spark built-ins — plus the Kafka message encode/decode pair).
  *
  * Scale notes: all writers partition by the DataFrame's partitioning (no
  * coalesce(1) in library code — single-file output is a test-only
  * convenience); `writeParquetPartitioned` demonstrates the
  * partition-pruning layout (`partitionBy` → directory-level pruning of
  * untouched partitions at 100 TB).
  */
object Sources {

  // ---- file formats ----

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Hive-style partitioned parquet layout: queries filtering on the
    * partition column scan only matching directories. */
  def writeParquetPartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** ORC (the other columnar warehouse format Spark ships natively):
    * same pushdown/pruning machinery as parquet — predicate pushdown,
    * column pruning, vectorized read. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  // ---- Kafka-shaped message encode/decode (producer.py:115-126 JSON
  //      serialize; app.py:156 JSON deserializer) ----

  /** Record → (key, value) JSON message, the producer's serialize step
    * (producer.py:122 `json.dumps(data).encode('utf-8')`). Timestamps are
    * carried as exact integer micros — to_json's ISO format truncates to
    * millis, which would be lossy. */
  def kafkaEncode(df: DataFrame, keyCol: String): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType.typeName == "timestamp")
        unix_micros(col(f.name)).as(f.name + "_us")
      else col(f.name)
    }
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(cols.toIndexedSeq: _*)).as("value"))
  }

  /** (key, value) JSON message → typed record, the consumer's deserialize
    * step (app.py:156) with PERMISSIVE nulls for malformed payloads. */
  def kafkaDecode(df: DataFrame, schema: StructType): DataFrame =
    df.select(from_json(col("value"), schema).as("r")).select(col("r.*"))
}
