package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.3) over ScalaCheck-generated
  * datasets: results must be invariant under row permutation and
  * repartitioning, decompositions must recompose, and approximations must
  * bound their exact counterparts. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val seed = rng.Seed(42L)

  /** Deterministic samples from a Gen (fixed seed, advanced per draw). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    var s = seed
    (0 until n).flatMap { _ =>
      s = s.next
      g.apply(Gen.Parameters.default, s)
    }
  }

  private val eventGen: Gen[(Long, Long, String, Double)] = for {
    id <- Gen.choose(0L, 999L)
    user <- Gen.choose(0L, 5L)
    tpe <- Gen.oneOf("click", "view", "purchase")
    value <- Gen.choose(-1000.0, 1000.0)
  } yield (id, user, tpe, math.rint(value * 100) / 100)

  private def eventsDf(rows: Seq[(Long, Long, String, Double)]) = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4))),
      schema)
  }

  test("grouped aggregation is invariant under permutation and repartitioning") {
    val rows = samples(eventGen, 300)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,6)")).cast("double").as("s"))
        .orderBy("user_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq
    val base = agg(eventsDf(rows))
    assert(agg(eventsDf(scala.util.Random.shuffle(rows))) == base)
    assert(agg(eventsDf(rows).repartition(13)) == base)
  }

  test("total count equals the sum of grouped counts") {
    val rows = samples(eventGen, 500)
    val df = eventsDf(rows)
    val total = df.count()
    val grouped = df.groupBy("user_id").count()
      .agg(sum("count")).collect()(0).getLong(0)
    assert(grouped == total)
  }

  test("top-1 by sort equals limit-1 of full sort for any data") {
    val rows = samples(eventGen, 200)
    val df = eventsDf(rows)
    val a = df.orderBy(col("value").desc, col("event_id")).limit(1).collect()
    val b = df.orderBy(col("value").desc, col("event_id")).collect().take(1)
    assert(a.toSeq == b.toSeq)
  }

  test("min-id keeper dedup: keepers are a partition of all ids") {
    val texts = samples(Gen.oneOf("a b c d e", "a b c d f", "x y z w v",
      "p q r s t u"), 60)
    val docs = {
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }), schema)
    }
    val out = dedup.Dedup.exactDedup(docs).collect()
    assert(out.map(_.getLong(1)).sum == texts.length) // copies partition ids
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    // each keeper is the minimal id of its text group
    val byText = texts.zipWithIndex.groupBy(_._1)
    val expectKeepers = byText.values.map(_.map(_._2).min.toLong).toSet
    assert(out.map(_.getLong(0)).toSet == expectKeepers)
  }

  test("minhash estimated jaccard tracks exact jaccard within tolerance") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 " +
      "w16 w17 w18 w19 w20 w21 w22 w23 w24 w25"
    val variants = Seq(base,
      base.replace("w13", "x13"),
      base.replace("w13 w14 w15", "x13 x14 x15"),
      "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12 z13")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(
        variants.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }), schema)
    val exact = dedup.Dedup.jaccardPairs(docs, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val est = dedup.Dedup.minhashLshPairs(docs, k = 64, bands = 16,
      threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    est.foreach { case (pair, e) =>
      val x = exact.getOrElse(pair, 0.0)
      assert(math.abs(e - x) < 0.35, s"$pair est=$e exact=$x")
    }
  }
}
