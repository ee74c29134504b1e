package graft

import org.scalatest.funsuite.AnyFunSuite

// top-level: Encoders cannot be derived for classes nested in a test class
case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: java.sql.Timestamp,
    o_orderpriority: String)

/** Typed Dataset[T] surface (SURVEY.md §1.4 note: DataFrame suffices for
  * the dynamic-schema queries; this spec covers the case-class-typed API
  * for users who want compile-time field checks). */
class TypedApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("as[T] gives typed filter/map/groupByKey with identical results") {
    val sq = spark
    import sq.implicits._
    val df = Tables.load(spark, TestSpark.sf, "orders")
    val ds = df.as[Order]

    val typedTotal = ds
      .filter(_.o_totalprice > 50000)
      .groupByKey(_.o_orderpriority)
      .mapGroups((k, rows) => (k, rows.map(_.o_totalprice).size))
      .collect().toMap
    val untypedTotal = {
      import org.apache.spark.sql.functions._
      df.filter(col("o_totalprice") > 50000)
        .groupBy("o_orderpriority").count()
        .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    }
    assert(typedTotal == untypedTotal)
  }

  test("typed map stays distributed and schema-checked") {
    val sq = spark
    import sq.implicits._
    val ds = Tables.load(spark, TestSpark.sf, "orders").as[Order]
    val enriched = ds.map(o => (o.o_orderkey, o.o_totalprice * 1.1))
    assert(enriched.columns.toSeq == Seq("_1", "_2"))
    assert(enriched.count() == ds.count())
  }
}
