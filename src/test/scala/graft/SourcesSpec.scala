package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink round-trips through real files (SURVEY.md §2.1 formats). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("CSV round-trip preserves rows and values") {
    val orders = Tables.load(spark, TestSpark.sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val dir = tmp("graft_csv")
    sources.Sources.writeCsv(orders, dir)
    val back = sources.Sources.readCsv(spark, dir, orders.schema)
    assert(back.count() == orders.count())
    val sumA = orders.agg(sum("o_totalprice")).collect()(0).getDouble(0)
    val sumB = back.agg(sum("o_totalprice")).collect()(0).getDouble(0)
    assert(math.abs(sumA - sumB) < 1e-6)
  }

  test("JSONL round-trip preserves rows") {
    val customer = Tables.load(spark, TestSpark.sf, "customer")
    val dir = tmp("graft_jsonl")
    sources.Sources.writeJsonl(customer, dir)
    val back = sources.Sources.readJsonl(spark, dir, customer.schema)
    assert(back.count() == customer.count())
    assert(back.agg(sum("c_custkey")).collect()(0).getLong(0) ==
      customer.agg(sum("c_custkey")).collect()(0).getLong(0))
  }

  test("ORC round-trip preserves rows and pushes predicates to the scan") {
    val orders = Tables.load(spark, TestSpark.sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val dir = tmp("graft_orc")
    sources.Sources.writeOrc(orders, dir)
    val back = sources.Sources.readOrc(spark, dir)
    assert(back.count() == orders.count())
    assert(back.agg(sum("o_orderkey")).collect()(0).getLong(0) ==
      orders.agg(sum("o_orderkey")).collect()(0).getLong(0))
    // predicate pushdown reaches the ORC scan like parquet
    val filtered = back.filter(col("o_totalprice") > 100000.0)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      plan.take(600))
  }

  test("partitioned parquet layout enables partition pruning") {
    val events = Tables.load(spark, TestSpark.sf, "events")
      .withColumn("event_date", to_date(col("ts")))
    val dir = tmp("graft_part")
    sources.Sources.writeParquetPartitioned(events, dir, Seq("event_date"))
    val pruned = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-05")
    // partition filter must appear as PartitionFilters, not a data filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_date"), plan.take(600))
    assert(pruned.count() > 0)
  }

  test("kafka encode/decode round-trip is lossless incl. timestamps") {
    val events = Tables.load(spark, TestSpark.sf, "events")
    val out = operators.Extended.jsonRoundtrip(events)
    assert(out.count() == events.count())
    val a = events.select(sum(unix_micros(col("ts")))).collect()(0).getLong(0)
    val b = out.select(sum(unix_micros(col("ts")))).collect()(0).getLong(0)
    assert(a == b)
  }

  test("malformed kafka message decodes to nulls (PERMISSIVE), then dropped") {
    import org.apache.spark.sql.types._
    val sq = spark
    import sq.implicits._
    val msgs = Seq(
      ("1", """{"event_id": 1, "value": 2.5}"""),
      ("2", "not json at all")).toDF("key", "value")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType)))
    val decoded = sources.Sources.kafkaDecode(msgs, schema)
    assert(decoded.count() == 2)
    assert(decoded.filter(col("event_id").isNotNull).count() == 1)
  }

  test("kafka adapter builds the reference's consumer/producer options") {
    val c = sources.Kafka.consumerOptions("broker:9092", "weather",
      startingOffsets = "latest", maxOffsetsPerTrigger = Some(500L),
      groupIdPrefix = Some("dashboard"))
    // app.py:147-163: topic, bootstrap servers, auto_offset_reset=latest,
    // consumer group, bounded poll -> their Structured Streaming names
    assert(c("kafka.bootstrap.servers") == "broker:9092")
    assert(c("subscribe") == "weather")
    assert(c("startingOffsets") == "latest")
    assert(c("maxOffsetsPerTrigger") == "500")
    assert(c("groupIdPrefix") == "dashboard")
    assert(c("failOnDataLoss") == "false")
    val p = sources.Kafka.producerOptions("broker:9092", "weather")
    assert(p("topic") == "weather" && p.contains("kafka.bootstrap.servers"))
  }

  test("kafka reader constructs; load() raises the standard deploy error " +
      "(connector jar not shipped in this sandbox)") {
    val reader = sources.Kafka.reader(spark,
      sources.Kafka.consumerOptions("broker:9092", "weather"))
    val e = intercept[Exception] { reader.load() }
    // Spark's guidance error names the kafka provider / integration guide
    // artifact the user must deploy — the documented substitution path.
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  // ---- custom DSv2 generator source (SyntheticEventsSource) ----

  private def synth(n: Long = 1000, slices: Int = 4) =
    spark.read.format("graft.sources.SyntheticEventsSource")
      .option("n", n).option("slices", slices).load()

  test("DSv2 source generates the documented deterministic rows") {
    val rows = synth(n = 10, slices = 2).collect()
    assert(rows.length == 10)
    val r7 = rows.find(_.getLong(0) == 7L).get
    assert(r7.getLong(2) == (7L * 2654435761L) % 1000L)
    assert(r7.getString(3) == "purchase") // types(7 % 5 = 2)
    assert(r7.getLong(4) == (7L * 31L) % 10000L)
  }

  test("DSv2 id-range filters are pushed into generation") {
    val df = synth(n = 100000, slices = 8)
      .filter(col("event_id") >= 25000 && col("event_id") < 75000)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[25000,75000)"), plan.take(800))
    assert(plan.contains("PushedIdFilters: ["), plan.take(800))
    assert(df.count() == 50000)
  }

  test("DSv2 column pruning reaches the reader") {
    val df = synth().select(col("event_type"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: event_type"), plan.take(800))
    assert(df.distinct().count() == 5)
  }

  test("DSv2 partitions match the requested slices") {
    assert(synth(n = 1000, slices = 4).rdd.getNumPartitions == 4)
  }

  test("DSv2 aggregate pushdown answers count/min/max in closed form") {
    val df = synth(n = 100000, slices = 8)
      .filter(col("event_id") >= 25000 && col("event_id") < 75000)
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("lo"),
        max(col("event_id")).as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: ["), plan.take(900))
    val r = df.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((50000L, 25000L, 74999L)))
  }

  test("DSv2 aggregate pushdown on an empty range yields 0/null/null") {
    val df = synth(n = 100).filter(col("event_id") >= 500)
      .agg(count(lit(1)), min(col("event_id")), max(col("event_id")))
    val r = df.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("binaryFile source ingests opaque media bytes with metadata") {
    // the real ingestion path for multimodal payloads (Multimodal.scala
    // consumes exactly this shape: opaque bytes + typed metadata)
    val dir = java.nio.file.Files.createTempDirectory("binfiles")
    val payloads = Seq("img0" -> Array[Byte](1, 2, 3, 4),
      "img1" -> Array[Byte](9, 8, 7))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(s"$name.bin"), bytes)
    }
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir.toString)
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val byName = df.collect().map(r =>
      (r.getString(0).split('/').last, r.getAs[Array[Byte]]("content")))
      .toMap
    assert(byName("img0.bin").toSeq == Seq[Byte](1, 2, 3, 4))
    assert(byName("img1.bin").toSeq == Seq[Byte](9, 8, 7))
  }

  test("DSv2 limit pushdown narrows generation to the first k ids") {
    val df = synth(n = 100000, slices = 8).limit(7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,7)"), plan.take(900))
    assert(df.count() == 7L)
  }

  test("DSv2 audited JSONL sink: two-phase commit publishes parts + " +
      "manifest; round-trip preserves rows") {
    val dir = tmp("graft_sink") + "/out"
    val orders = Tables.load(spark, TestSpark.sf, "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .repartition(3)
    orders.write.format("graft.sources.AuditedJsonlSink")
      .option("path", dir).mode("append").save()
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".jsonl")) == 3, files.mkString(","))
    assert(files.contains("_MANIFEST"))
    val manifest = scala.io.Source.fromFile(new java.io.File(dir, "_MANIFEST"))
    val lines = try manifest.getLines().toSeq finally manifest.close()
    assert(lines.last == s"""{"total_rows":${orders.count()}}""")
    val back = spark.read.schema(orders.schema).json(dir + "/part-*.jsonl")
    assert(back.count() == orders.count())
    val sa = orders.agg(sum("o_orderkey"), sum("o_totalprice")).head()
    val sb = back.agg(sum("o_orderkey"), sum("o_totalprice")).head()
    assert(sa.getLong(0) == sb.getLong(0))
    assert(math.abs(sa.getDouble(1) - sb.getDouble(1)) < 1e-6)
  }

  test("DSv2 audited JSONL sink: a re-published directory is REPLACED " +
      "whole — no stale parts mix under the new manifest") {
    import spark.implicits._
    val dir = tmp("graft_sink_replace") + "/out"
    // first publication: 3 parts
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").repartition(3)
      .write.format("graft.sources.AuditedJsonlSink")
      .option("path", dir).mode("append").save()
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".jsonl")) == 3)
    // replay/replace with FEWER partitions: old part-00002 must go
    Seq((9L, "z")).toDF("id", "v").repartition(1)
      .write.format("graft.sources.AuditedJsonlSink")
      .option("path", dir).mode("append").save()
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.count(_.endsWith(".jsonl")) == 1, files.mkString(","))
    val src = scala.io.Source.fromFile(new java.io.File(dir, "_MANIFEST"))
    val lines = try src.getLines().toSeq finally src.close()
    assert(lines.last == """{"total_rows":1}""")
    val back = spark.read
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
      .json(dir + "/part-*.jsonl")
    assert(back.collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("DSv2 audited JSONL sink: non-finite doubles serialize as JSON " +
      "null, not row-corrupting NaN tokens") {
    import spark.implicits._
    val dir = tmp("graft_sink_nan") + "/out"
    Seq((1L, Double.NaN), (2L, Double.PositiveInfinity), (3L, 0.5))
      .toDF("id", "x").repartition(1)
      .write.format("graft.sources.AuditedJsonlSink")
      .option("path", dir).mode("append").save()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.DoubleType)))
    val back = spark.read.schema(schema).json(dir + "/part-*.jsonl")
      .orderBy("id").collect()
    // all three ROWS survive (ids intact); the non-finite cells are null
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(back(0).isNullAt(1) && back(1).isNullAt(1))
    assert(back(2).getDouble(1) == 0.5)
  }

  test("DSv2 audited JSONL sink: timestamps round-trip losslessly " +
      "(ISO-8601 — a numeric cell would read back seconds-scaled or null)") {
    import spark.implicits._
    val dir = tmp("graft_sink_ts") + "/out"
    // one instant (TimestampType) + one wall-clock (TimestampNTZType),
    // full micro precision, including a pre-epoch value (negative
    // micros exercise the floorDiv/floorMod split)
    val df = Seq(
      (1L, java.time.Instant.parse("2024-03-01T12:34:56.123456Z"),
        java.time.LocalDateTime.parse("2024-03-01T12:34:56.654321")),
      (2L, java.time.Instant.parse("1969-12-31T23:59:59.000001Z"),
        java.time.LocalDateTime.parse("1969-12-31T23:59:59.000001")))
      .toDF("id", "t", "tn").repartition(1)
    df.write.format("graft.sources.AuditedJsonlSink")
      .option("path", dir).mode("append").save()
    val back = spark.read.schema(df.schema).json(dir + "/part-*.jsonl")
    // JSON read marks everything nullable — compare names + types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("DSv2 audited JSONL sink: abort leaves nothing visible") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val dir = tmp("graft_sink_abort") + "/out"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val bw = new sources.AuditedJsonlBatchWrite(schema, dir)
    val w = new sources.JsonlWriterFactory(schema, dir).createWriter(0, 7L)
    w.write(InternalRow(1L, UTF8String.fromString("x")))
    val msg = w.commit()
    // job-level failure AFTER a task committed: abort must delete temps
    bw.abort(Array(msg))
    val temp = new java.io.File(dir, "_temp")
    assert(!temp.exists() || temp.listFiles().isEmpty)
    assert(!new java.io.File(dir, "_MANIFEST").exists())
    assert(Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .forall(!_.getName.endsWith(".jsonl")))
  }

  test("mergeSchema read unions widened batch schemas; old rows " +
      "surface added columns as null") {
    import spark.implicits._
    val dir = tmp("graft_evolve")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30), (4L, "d", 40)).toDF("id", "v", "extra")
      .write.mode("append").parquet(dir)
    val merged = sources.Sources.readMergedSchema(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("extra", "id", "v"))
    assert(merged.count() == 4L)
    assert(merged.filter(col("extra").isNull).count() == 2L)
    assert(merged.filter(col("id") === 3L).head().getAs[Int]("extra") == 30)
  }

  test("compaction rewrites a many-small-file table into few files " +
      "with identical contents") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val inDir = tmp("graft_small") + "/t"
    docs.repartition(64).write.parquet(inDir)
    val outDir = tmp("graft_compact") + "/t"
    val (before, after) =
      sources.Sources.compact(spark, inDir, outDir, 256L * 1024 * 1024)
    assert(before == 64, s"expected 64 input part files, got $before")
    assert(after < 8, s"expected few output files, got $after")
    val a = spark.read.parquet(inDir)
    val b = spark.read.parquet(outDir)
    assert(b.count() == a.count())
    val sa = a.agg(sum(col("doc_id")), sum(col("n_chars"))).head()
    val sb = b.agg(sum(col("doc_id")), sum(col("n_chars"))).head()
    assert(sa == sb)
  }

  test("bloom-filter layout: every row group's footer carries the " +
      "filter; point lookups answer identically") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val dir = tmp("graft_bloom") + "/t"
    sources.Sources.writeWithBloom(docs.repartition(4), dir, "doc_id",
      ndv = 10000L)
    assert(sources.Sources.bloomFilterPresent(spark, dir, "doc_id"))
    // a column NOT opted in carries no filter — the audit discriminates
    assert(!sources.Sources.bloomFilterPresent(spark, dir, "source"))
    val expected = docs.filter(col("doc_id") === 7L)
      .select(col("doc_id"), col("source")).collect()
    val got = spark.read.parquet(dir).filter(col("doc_id") === 7L)
      .select(col("doc_id"), col("source")).collect()
    assert(got.toSeq == expected.toSeq && got.nonEmpty)
  }

  test("CBO statistics: ANALYZE feeds exact row counts into Catalyst " +
      "and filter selectivity estimates become bounded") {
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val tbl = sources.Sources.analyzedTable(spark, TestSpark.sf, "orders")
      val trueCount = spark.table(tbl).count()
      // catalog row count is exact post-ANALYZE
      val full = spark.table(tbl).queryExecution.optimizedPlan.stats
      assert(full.rowCount.contains(BigInt(trueCount)))
      // CBO selectivity: an equality filter on an analyzed column gets
      // a row estimate STRICTLY below the table's and above zero —
      // the file-size fallback can't produce either bound
      val filtered = spark.table(tbl)
        .filter(col("o_orderpriority") === "1-URGENT")
        .queryExecution.optimizedPlan.stats
      assert(filtered.rowCount.isDefined)
      val est = filtered.rowCount.get
      assert(est > 0 && est < BigInt(trueCount),
        s"estimate $est not in (0, $trueCount)")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
  }

  test("ignoreCorruptFiles skips a torn file and keeps healthy rows; " +
      "the strict default fails fast") {
    import spark.implicits._
    val dir = tmp("graft_corrupt")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(dir + "/t")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir + "/t/part-torn.parquet"),
      Array.fill[Byte](128)(0x5a))
    val ok = sources.Sources.readIgnoreCorrupt(spark, dir + "/t")
    assert(ok.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir + "/t").count()
    }
  }
}
