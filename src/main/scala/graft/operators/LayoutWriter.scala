package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{HilbertValue, ZValue}

/** Write-side data layout: cluster a table on a space-filling-curve key
  * so that 2-D box reads touch few files. The read side of this story is
  * already covered (q_zorder / q_zorder_range query the curve values);
  * this is the producer half — the thing a 100 TB deployment actually
  * runs nightly so that every later `x BETWEEN … AND y BETWEEN …` scan
  * prunes at the FILE level instead of reading the whole table.
  *
  * Mechanics: compute the curve value, `repartitionByRange` on it (one
  * range shuffle — sampled boundaries, balanced output files), sort
  * within partitions, write one file per partition. Each file then owns
  * a compact curve interval, and because both curves preserve 2-D
  * locality, a compact curve interval is a small 2-D region: any query
  * box intersects O(perimeter) files, not all of them. A linear (single
  * column or insertion-order) layout spreads one dimension across every
  * file, so almost every file intersects.
  *
  * The pruning contract is checked in LayoutSpec against the real file
  * statistics ([[fileStats]] = per-file min/max of x and y — exactly
  * what parquet footers/catalog manifests store): z-ordered files must
  * let a small box skip most files; the same data written row-ordered
  * must not. No new readers needed at scale — engines prune on these
  * stats natively; the layout just has to make them tight. */
object LayoutWriter {

  /** Cluster `df` on the Morton (default) or Hilbert index of (x, y)
    * into `numFiles` range-partitioned, internally-sorted parquet files.
    * Both dimensions are first affinely rescaled to a shared 10-bit
    * grid (one tiny min/max aggregate — negligible against the layout
    * shuffle, and a job-level constant a production writer would read
    * from table stats): interleaving raw values whose ranges differ by
    * orders of magnitude lets the wide dimension's high bits dominate,
    * which quietly degrades the curve back to a single-dim sort. The
    * curve column is persisted too, so readers can ALSO express a box
    * as a curve-range scan (q_zorder_range's pattern). */
  def writeCurveClustered(df: DataFrame, x: Column, y: Column,
      outDir: String, numFiles: Int = 16,
      curve: String = "morton"): Unit = {
    val b = df.agg(min(x).cast("long"), max(x).cast("long"),
      min(y).cast("long"), max(y).cast("long")).collect()(0)
    val (x0, x1, y0, y1) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    def grid(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else ((c.cast("long") - lo) * 1023L / (hi - lo)).cast("long")
    val (gx, gy) = (grid(x, x0, x1), grid(y, y0, y1))
    val key = curve match {
      case "hilbert" => HilbertValue.hilbert(gx, gy)
      case _ => ZValue.zvalue(gx, gy)
    }
    df.withColumn("curve_key", key)
      .repartitionByRange(numFiles, col("curve_key"))
      .sortWithinPartitions(col("curve_key"))
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file min/max statistics of the two layout dimensions — the
    * pruning metadata a file-skipping reader consults. One scan, one
    * tiny aggregate grouped by file name. */
  def fileStats(spark: SparkSession, dir: String, xCol: String,
      yCol: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"),
        count(lit(1)).as("n_rows"))

  /** How many files a box read must touch, given the file statistics:
    * a file can be skipped iff its [min,max] envelope misses the box in
    * either dimension. */
  def filesTouched(stats: DataFrame, xLo: Long, xHi: Long, yLo: Long,
      yHi: Long): Long =
    stats.filter(
      col("x_max") >= xLo && col("x_min") <= xHi &&
      col("y_max") >= yLo && col("y_min") <= yHi).count()
}
