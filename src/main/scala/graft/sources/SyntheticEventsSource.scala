package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataTypes, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2: the reference's synthetic event producer
  * (producer.py:90-101 — deterministic event records) re-expressed as a
  * first-class Spark table that GENERATES rows distributively instead
  * of materializing them up front.
  *
  * This is the full DSv2 read ladder:
  *  - `TableProvider` → `Table` → `ScanBuilder` with
  *    `SupportsPushDownRequiredColumns` (the reader materializes ONLY
  *    requested fields) and `SupportsPushDownFilters` (range predicates
  *    on `event_id` narrow the generated id interval — the scan never
  *    produces filtered-out rows, the DSv2 analogue of parquet
  *    row-group pruning);
  *  - `Batch.planInputPartitions` splits the id range into `slices`
  *    independent partitions — on a 1000-executor cluster each
  *    partition generates its slice with zero coordination.
  *
  * Generation is pure integer arithmetic on `event_id`, so any query
  * over the source is DuckDB-oracle-checkable via `range()`:
  *   ts      = 2024-01-01T00:00:00Z + event_id seconds
  *   user_id = (event_id · 2654435761) mod 1000
  *   event_type = ("view","click","purchase","scroll","hover")[id mod 5]
  *   cents   = (event_id · 31) mod 10000
  *
  * Usage: `spark.read.format("graft.sources.SyntheticEventsSource")
  *   .option("n", 100000).option("slices", 8).load()`.
  */
class SyntheticEventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEventsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticEventsTable(
      Option(properties.get("n")).map(_.toLong).getOrElse(100000L),
      Option(properties.get("slices")).map(_.toInt).getOrElse(8))
}

object SyntheticEventsSource {
  val schema: StructType = new StructType()
    .add("event_id", DataTypes.LongType, nullable = false)
    .add("ts", DataTypes.TimestampType, nullable = false)
    .add("user_id", DataTypes.LongType, nullable = false)
    .add("event_type", DataTypes.StringType, nullable = false)
    .add("cents", DataTypes.LongType, nullable = false)

  val baseMicros: Long = 1704067200L * 1000000L // 2024-01-01T00:00:00Z
  val types: Array[UTF8String] =
    Array("view", "click", "purchase", "scroll", "hover")
      .map(UTF8String.fromString)

  def fieldValue(name: String, id: Long): Any = name match {
    case "event_id" => id
    case "ts" => baseMicros + id * 1000000L
    case "user_id" => (id * 2654435761L) % 1000L
    case "event_type" => types((id % 5).toInt)
    case "cents" => (id * 31L) % 10000L
  }
}

class SyntheticEventsTable(n: Long, slices: Int) extends Table
    with SupportsRead {
  override def name(): String = s"synthetic_events(n=$n)"
  override def schema(): StructType = SyntheticEventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(
      Option(options.get("n")).map(_.toLong).getOrElse(n),
      Option(options.get("slices")).map(_.toInt).getOrElse(slices),
      Option(options.get("rowsPerBatch")).map(_.toLong).getOrElse(0L),
      Option(options.get("redeliver")).exists(_.toBoolean))
}

class SyntheticScanBuilder(n: Long, slices: Int, rowsPerBatch: Long,
    redeliver: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  private var lo: Long = 0L
  private var hi: Long = n // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticEventsSource.schema
  private var aggPushed: Option[Aggregation] = None

  /** LIMIT k over an ordered-by-nothing generator = generate only the
    * first k ids of the (filtered) range. */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    true // fully handled — Spark may drop its own Limit
  }

  /** COUNT(*) / MIN(event_id) / MAX(event_id) over a generated id range
    * are CLOSED FORMS — answer them at plan time with a one-row scan,
    * the DSv2 analogue of parquet footer-statistics aggregation. Only
    * complete (not partial) pushdown is claimed, and only with no
    * grouping. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall {
      case _: CountStar => true
      case m: Min => isEventId(m.column)
      case m: Max => isEventId(m.column)
      case c: Count => !c.isDistinct && isEventId(c.column)
      case _ => false
    }
  private def isEventId(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case nr: NamedReference => nr.fieldNames.sameElements(Array("event_id"))
    case _ => false
  }
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    aggPushed = Some(agg)
    true
  }

  /** Range predicates on event_id narrow [lo, hi); everything else is
    * left for Spark to evaluate. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("event_id", v: Number) =>
        lo = math.max(lo, v.longValue); true
      case GreaterThan("event_id", v: Number) =>
        lo = math.max(lo, v.longValue + 1); true
      case LessThan("event_id", v: Number) =>
        hi = math.min(hi, v.longValue); true
      case LessThanOrEqual("event_id", v: Number) =>
        hi = math.min(hi, v.longValue + 1); true
      case EqualTo("event_id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1); true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = aggPushed match {
    case Some(agg) =>
      // Closed-form aggregate scan: one partition, one row.
      val span = math.max(0L, hi - lo)
      val values: Array[Any] = agg.aggregateExpressions.map {
        case _: CountStar => span
        case _: Count => span
        case _: Min => if (span > 0) lo else null
        case _: Max => if (span > 0) hi - 1 else null
      }.toArray
      val schema = new StructType(values.indices.map(i =>
        org.apache.spark.sql.types.StructField(s"agg_$i",
          DataTypes.LongType)).toArray)
      new Scan with Batch {
        override def readSchema(): StructType = schema
        override def description(): String =
          s"SyntheticEvents range=[$lo,$hi) PushedAggregates: " +
            agg.aggregateExpressions.mkString("[", ", ", "]")
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(SyntheticAggRow(values))
        override def createReaderFactory(): PartitionReaderFactory =
          SyntheticReaderFactory
      }
    case None => buildRowScan()
  }

  private def buildRowScan(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def description(): String =
      s"SyntheticEvents range=[$lo,$hi) PushedIdFilters: " +
        pushed.mkString("[", ", ", "]") +
        s" ReadSchema: ${required.fieldNames.mkString(",")}"
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val span = math.max(0L, hi - lo)
      val per = math.max(1L, (span + slices - 1) / slices)
      (0 until slices).iterator
        .map(s => (lo + s * per, math.min(hi, lo + (s + 1) * per)))
        .filter { case (a, b) => a < b }
        .map { case (a, b) =>
          SyntheticRange(a, b, required.fieldNames): InputPartition
        }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      SyntheticReaderFactory

    /** Streaming path: the same generator as an unbounded-API source
      * with REAL offset semantics — offsets are id watermarks, each
      * micro-batch covers [start, end) exactly once, and replay of a
      * committed range regenerates identical rows (deterministic
      * generation makes the source trivially replayable, which is what
      * gives end-to-end exactly-once with any idempotent sink). */
    override def toMicroBatchStream(checkpointLocation: String)
        : MicroBatchStream =
      new SyntheticMicroBatchStream(hi,
        if (rowsPerBatch > 0) rowsPerBatch else math.max(1L, hi / 4),
        slices, required.fieldNames, redeliver)
  }
}

case class SyntheticOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

/** `redeliver = true` simulates an AT-LEAST-ONCE transport: each
  * micro-batch re-emits the PREVIOUS batch's id range alongside its own
  * (offsets are unchanged — the overlap is deliberate reader-side
  * duplication, the shape a Kafka consumer sees after a rebalance or a
  * producer retry). Deterministic, so the dedup operator downstream is
  * end-to-end oracle-checkable: kept set == exactly the n unique rows. */
class SyntheticMicroBatchStream(n: Long, rowsPerBatch: Long, slices: Int,
    fields: Array[String], redeliver: Boolean = false)
    extends MicroBatchStream
    with SupportsTriggerAvailableNow {
  private var advertised = 0L
  // Trigger.AvailableNow contract: pin the end of "available" data at
  // prepare time; the engine drains micro-batches (still rowsPerBatch
  // each) until this target, then stops on its own.
  private var target = n

  override def prepareForTriggerAvailableNow(): Unit = target = n

  override def initialOffset(): Offset = SyntheticOffset(0L)
  override def latestOffset(): Offset = {
    advertised = math.min(target, advertised + rowsPerBatch)
    SyntheticOffset(advertised)
  }
  // SupportsAdmissionControl form (the rowsPerBatch step IS our rate
  // limit, so the engine-supplied ReadLimit needs no extra handling).
  // On RESTART the engine passes the checkpoint-restored offset as
  // `start` while this object is fresh — floor the advance there, or a
  // restarted query would re-advertise (and re-emit) committed ranges.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startId = start.asInstanceOf[SyntheticOffset].id
    advertised = math.max(advertised, startId)
    // Never advertise BELOW the committed start: a restart with a smaller
    // `n` than the committed watermark (run 1 n=1000, run 2 n=600) would
    // otherwise return end < start after the min(target, ...) step.
    advertised = math.max(startId,
      math.min(target, advertised + rowsPerBatch))
    SyntheticOffset(advertised)
  }
  override def deserializeOffset(json: String): Offset =
    SyntheticOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[SyntheticOffset].id
    val hi = end.asInstanceOf[SyntheticOffset].id
    def slice(a0: Long, b0: Long): Iterator[InputPartition] = {
      val span = math.max(0L, b0 - a0)
      val per = math.max(1L, (span + slices - 1) / slices)
      (0 until slices).iterator
        .map(s => (a0 + s * per, math.min(b0, a0 + (s + 1) * per)))
        .filter { case (a, b) => a < b }
        .map { case (a, b) => SyntheticRange(a, b, fields): InputPartition }
    }
    // at-least-once simulation: re-emit the previous batch's range
    // (ids within one batch stay unique — the two ranges are disjoint)
    val redelivered = if (redeliver && lo > 0)
      slice(math.max(0L, lo - rowsPerBatch), lo) else Iterator.empty
    (redelivered ++ slice(lo, hi)).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    SyntheticReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class SyntheticRange(lo: Long, hi: Long, fields: Array[String])
    extends InputPartition

/** Single pre-computed row (closed-form aggregate pushdown result). */
case class SyntheticAggRow(values: Array[Any]) extends InputPartition

object SyntheticReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
    case SyntheticAggRow(values) => new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(values.clone())
      override def close(): Unit = ()
    }
    case _ => createRowReader(p)
  }

  private def createRowReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SyntheticRange]
    new PartitionReader[InternalRow] {
      private var id = r.lo - 1
      private val row = new GenericInternalRow(r.fields.length)
      override def next(): Boolean = { id += 1; id < r.hi }
      override def get(): InternalRow = {
        var i = 0
        while (i < r.fields.length) {
          row.update(i, SyntheticEventsSource.fieldValue(r.fields(i), id))
          i += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}
