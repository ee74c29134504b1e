package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}
import org.apache.spark.sql.Row

/** Kafka transport adapter — the reference's message spine
  * (producer.py:128-167 sync-ack `KafkaProducer.send`; app.py:147-163
  * `KafkaConsumer` with a consumer group and `auto_offset_reset=latest`)
  * expressed as Structured Streaming `format("kafka")` configuration.
  *
  * This sandbox ships no Kafka broker and no `spark-sql-kafka-0-10`
  * connector jar (offline resolver), so these builders are
  * CONSTRUCTION-ONLY here: they produce a fully-configured reader/writer
  * whose `.load()`/`.start()` resolves the `kafka` provider at runtime —
  * on a real cluster with the connector deployed they run as-is; here
  * they raise Spark's standard "Failed to find data source: kafka"
  * deployment error (pinned by SourcesSpec). Every test and oracled query
  * instead drives the same pipeline over file streams +
  * [[Sources.kafkaEncode]]/[[Sources.kafkaDecode]], which preserve the
  * reference's JSON message shape exactly. README documents the
  * option-by-option mapping.
  */
object Kafka {

  /** Consumer-side configuration (app.py:147-163). `startingOffsets`
    * carries `auto_offset_reset` ("latest"/"earliest"/JSON offsets);
    * `maxOffsetsPerTrigger` bounds each micro-batch like the reference's
    * bounded `poll()` loop; `groupIdPrefix` maps the consumer group
    * (Spark manages its own group ids — offsets live in the CHECKPOINT,
    * not the broker, which is what upgrades the reference's lost-offset
    * restart to exactly-once). */
  def consumerOptions(bootstrapServers: String, topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      groupIdPrefix: Option[String] = None,
      failOnDataLoss: Boolean = false): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      groupIdPrefix.map("groupIdPrefix" -> _)

  /** Producer-side configuration (producer.py:128-167). The reference's
    * synchronous-ack `send().get()` per record maps to micro-batch commit
    * semantics: the batch is the ack unit, and the checkpoint (not the
    * producer) owns delivery state. */
  def producerOptions(bootstrapServers: String, topic: String)
      : Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic)

  /** Fully-configured streaming reader for a Kafka topic. `.load()`
    * yields the standard (key, value, topic, partition, offset,
    * timestamp) schema; feed `value` through [[Sources.kafkaDecode]] to
    * recover typed records (app.py:156's JSON deserializer). */
  def reader(spark: SparkSession, options: Map[String, String])
      : DataStreamReader =
    spark.readStream.format("kafka").options(options)

  /** Fully-configured streaming writer publishing [[Sources.kafkaEncode]]
    * (key, value) messages to a topic. */
  def writer(messages: DataFrame, options: Map[String, String],
      checkpointLocation: String): DataStreamWriter[Row] =
    messages.writeStream.format("kafka").options(options)
      .option("checkpointLocation", checkpointLocation)
}
