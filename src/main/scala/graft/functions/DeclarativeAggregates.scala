package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression, If, IsNull, Literal, Round}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Exact money sum in integer cents as a `DeclarativeAggregate` — the
  * highest-performance rung of the custom-aggregate ladder (above
  * `Aggregator` and `TypedImperativeAggregate`): the whole update/merge
  * path is EXPRESSIONS, so it lives inside whole-stage codegen'd
  * HashAggregate with no per-row virtual calls or serialization.
  *
  * Same semantics as [[TypedAggregators.exactPriceStats]]'s cents sum:
  * round(price·100) accumulated in Long — order-independent, so
  * oracle-exact. Null inputs contribute nothing. */
case class CentsSum(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "cents_sum"

  private lazy val cents =
    AttributeReference("cents", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(cents)

  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    cents + If(IsNull(child), Literal(0L),
      Cast(Round(child * Literal(100.0), Literal(0)), LongType)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    cents.left + cents.right)

  override lazy val evaluateExpression: Expression = cents

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object DeclarativeAggregates {
  /** Column API: exact cents sum of a double price column. */
  def centsSum(c: Column): Column =
    Shim.column(CentsSum(Shim.expression(c.cast(DoubleType)))
      .toAggregateExpression(isDistinct = false))
}
