package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift canary (see Tables.contract): when the driver
  * regenerates the parquet fixtures with a changed physical type, this
  * suite fails naming the drifted column — instead of the round-5 mode
  * where drift surfaced as dozens of opaque downstream analysis errors. */
class FixtureContractSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("fixture schemas match the contract (drift names the column)") {
    val drift = Tables.checkContract(spark, TestSpark.sf)
    assert(drift.isEmpty,
      s"\nFIXTURE SCHEMA DRIFT:\n  ${drift.mkString("\n  ")}\n" +
        "If the new type is a legitimate new vintage, extend " +
        "Tables.contract AND the loaders that branch on it " +
        "(Tables.normalizeTs, EventsPipeline.historicalRangeScan, " +
        "StreamingPipeline.eventsStream).")
  }

  test("normalizeTs canonicalizes every known events.ts vintage") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val sq = spark
    import sq.implicits._
    // micros-instant vintage arrives as TIMESTAMP_NTZ
    val ntz = Seq(1706572694607263L).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    // nanos vintage arrives as long (nanosAsLong)
    val nanos = Seq(1706572694607263L * 1000L).toDF("ts")
    val fromNtz = Tables.normalizeTs(ntz).schema("ts").dataType
    val fromNanos = Tables.normalizeTs(nanos).schema("ts").dataType
    assert(fromNtz == TimestampType && fromNanos == TimestampType)
    // same instant from both vintages (session is UTC)
    val a = Tables.normalizeTs(ntz).select(unix_micros(col("ts"))).head().getLong(0)
    val b = Tables.normalizeTs(nanos).select(unix_micros(col("ts"))).head().getLong(0)
    assert(a == 1706572694607263L && b == 1706572694607263L)
  }
}
