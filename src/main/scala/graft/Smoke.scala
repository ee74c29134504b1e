package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: exercises the driver's t1 contract
  * (SparkEntry.entry rows > 0) and optionally one named query.
  * Usage: runMain graft.Smoke [queryName sfDir] */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args match {
      case Array(name, sfDir) =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.show(20, truncate = false)
        println(s"SMOKE $name rows=${df.count()}")
      case Array(name, sfDir, "explain") =>
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      case Array("probe") =>
        // scratch: inspect optimizer-facing expression trees
        import org.apache.spark.sql.functions._
        val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
        val v = e.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"),
            col("ts").as("view_ts"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
        val j = v.join(p,
          col("user_id") === col("p_user_id") &&
            col("purchase_ts") <= col("view_ts") &&
            col("purchase_ts") >= col("view_ts") - expr("INTERVAL 1 HOUR"))
        j.queryExecution.optimizedPlan.collect {
          case jn: org.apache.spark.sql.catalyst.plans.logical.Join =>
            jn.condition.foreach { c =>
              println(c.treeString)
              c.foreach(e => println(s"NODE ${e.getClass.getName}"))
            }
        }
      case Array(name, sfDir, "rtplan") =>
        // Post-execution adaptive plan (shows runtime exchange reuse).
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      case Array(name, sfDir, "time") =>
        // Warmup once (JIT/codegen/reader init), then three timed runs.
        spark.range(2000000).selectExpr("sum(id * 2)").collect()
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(name)(spark, sfDir).count()
          println(f"TIME $name run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      case _ =>
        val df = SparkEntry.entry(spark)
        df.show(5, truncate = false)
        println(s"SMOKE entry rows=${df.count()}")
    }
    spark.stop()
  }
}
