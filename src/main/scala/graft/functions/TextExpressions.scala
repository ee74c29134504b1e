package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingling: one compiled pass per document.
  *
  * The composable form — `array_distinct(transform(sequence(0, len-n),
  * i => concat_ws(' ', slice(tokens, i+1, n))))` — runs the lambda in
  * Catalyst's INTERPRETED higher-order-function path: per shingle it
  * allocates a slice array, dispatches concat_ws reflectively, then
  * array_distinct rescans the result. Measured on the corpus fixture
  * that path is the single largest cost of every shingle-based operator
  * (Jaccard index build, MinHash signatures, top n-grams): ~6 µs per
  * shingle of pure interpretation overhead.
  *
  * This expression emits the distinct n-gram array in one tight loop
  * (split, StringBuilder window join, LinkedHashSet dedup) behind a
  * single static call that whole-stage codegen inlines. Semantics are
  * bit-identical to the composable form (and to the DuckDB oracle's
  * `string_split(text,' ')` shingling):
  *  - tokens = split on the single space character, EMPTY TOKENS KEPT
  *    (Java `split(" ", -1)` == Spark `split(c, " ")` == DuckDB
  *    `string_split`);
  *  - fewer than n tokens → one shingle: the space-rejoin of all tokens;
  *  - first-occurrence order (what array_distinct produces).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object WordShingles {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(toks.mkString(" "))))
    val seen = new java.util.LinkedHashSet[String](
      math.max(8, toks.length * 2))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def wordShingles(text: Column, n: Int): Column =
    Shim.column(WordShingles(Shim.expression(text), n))
}
