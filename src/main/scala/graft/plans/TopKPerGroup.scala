package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftshim.Shim

/** Custom whole-operator: top-k rows per group — the full
  * LogicalPlan + Strategy + SparkPlan ladder (builder spec option (c)),
  * used where composed built-ins leave performance on the table.
  *
  * Spark plans `row_number().over(partitionBy(g).orderBy(o)) <= k` as a
  * FULL SORT of every partition's rows (window sort) followed by a
  * filter: O(n log n) comparisons and a complete sorted materialization
  * even though only k rows per group survive. This operator keeps one
  * bounded heap per group — O(n log k), no full sort, memory O(groups·k)
  * — after one clustering exchange (`requiredChildDistribution` makes
  * Catalyst insert it). At 100 TB with small k this is the difference
  * between shuffle-and-heap and shuffle-and-sort-everything.
  *
  * Exactness: ties must be broken by the caller's sort order (include a
  * unique key, as everywhere else in this library); results are then
  * identical to the window formulation and oracle-checkable by the same
  * SQL. */
case class TopKPerGroupPlan(groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder], k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder], k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** All rows of a group in one partition → one heap pass is exact. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val sortExprs = sortOrder
    val groupProj = groupExprs
    val limit = k
    child.execute().mapPartitions { iter =>
      val ordering = GenerateOrdering.generate(sortExprs, schema)
      val keyProj = UnsafeProjection.create(groupProj, schema)
      // max-heap under `ordering`: head = worst kept row, evicted when a
      // better row arrives and the heap is full
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val u = row.asInstanceOf[UnsafeRow]
        val key = keyProj(u)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](
              ordering.asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(u.copy())
        else if (ordering.compare(u, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(u.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.toSeq.sorted(ordering.asInstanceOf[Ordering[UnsafeRow]])
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, s, k, child) =>
      TopKPerGroupExec(g, s, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  import org.apache.spark.sql.catalyst.expressions.Descending

  /** Top-k rows per group by the given sort columns (include a unique
    * tiebreaker for determinism; `desc = true` for descending). Columns
    * are resolved by name against the DataFrame's analyzed plan — Spark
    * 4's analyzer does not resolve column-node wrappers inside custom
    * logical nodes, so resolution happens here. Installs [[TopKStrategy]]
    * on the session if absent — works on any SparkSession, no extensions
    * required at session build time. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    Strategies.ensureRegistered(spark, TopKStrategy)
    val child = df.queryExecution.analyzed
    val byName = child.output.map(a => a.name -> a).toMap
    def attr(n: String): Attribute = byName.getOrElse(n,
      throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name)}"))
    val order = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    Shim.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(attr), order, k, child))
  }
}
