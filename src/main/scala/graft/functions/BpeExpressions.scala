package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenization with a FIXED, embedded merge
  * table — upgrades the engine's token accounting (chunking, packing,
  * token stats) from whitespace-word-accurate to subword-token-accurate,
  * the unit LLM training pipelines actually budget in (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Semantics (exactly replayable in SQL, which is what makes the query
  * oracle-able): a word is split into single characters, then each merge
  * `(a, b)` is applied IN RANK ORDER as one left-to-right pass that
  * rewrites every adjacent `[a, b]` into `ab`. No merge here has a == b,
  * so within one pass candidate occurrences can never overlap (a start
  * at p and p+1 would force tok(p+1) = a = b) — "greedy left-to-right"
  * and "merge all candidates" coincide, and the DuckDB oracle replays
  * each rank as a lead/lag window CTE with no run-parity logic needed.
  *
  * The merge ranks are constants of the library (like the LSH hyperplane
  * constants), LEARNED FROM THE CORPUS by this engine's own trainer
  * ([[graft.text.TextAnalysis.bpeTrain]], k=64 over the sf0.1 fixture
  * documents; regenerate with `sbt "Test/runMain graft.GenBpeTable"`),
  * embedded so both engines replay the identical table. The budget is
  * corpus-bounded: the fixture vocabulary has 31 distinct words, so
  * cross-symbol digrams saturate at 89 merges (every word a single
  * token); 64 is the vocab-size budget below saturation that keeps the
  * realistic trained shape — frequent words whole-word tokens, the rest
  * subword-split (avg 1.79 tokens/word over corpus occurrences). A
  * production pipeline over a real corpus would run the same trainer
  * with a thousands-sized budget and load the table here — same
  * expression, longer table.
  *
  * Scale: the expression is a single static call inside whole-stage
  * codegen — one pass over each word, no per-rank shuffle. Applied to
  * DISTINCT words (vocab-sized, Zipf-bounded) and joined back, never to
  * the corpus directly.
  */
object Bpe {
  /** (a, b) pairs applied in rank order — bpeTrain(k=64) output on the
    * sf0.1 corpus (see object doc). INVARIANT (relied on by the
    * no-overlap argument above and guaranteed by the trainer's a != b
    * selection filter; checked at class-init): a != b. */
  val merges: Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "o" -> "r", "s" -> "t",
    "o" -> "w", "t" -> "a", "l" -> "u", "m" -> "er",
    "a" -> "r", "p" -> "ar", "u" -> "p", "par" -> "k",
    "s" -> "park", "d" -> "ow", "in" -> "dow", "w" -> "indow",
    "g" -> "e", "mer" -> "ge", "b" -> "l", "bl" -> "e",
    "ta" -> "ble", "c" -> "o", "co" -> "lu", "colu" -> "m",
    "colum" -> "n", "c" -> "t", "ct" -> "or", "e" -> "ctor",
    "v" -> "ector", "a" -> "m", "e" -> "am", "r" -> "eam",
    "st" -> "ream", "a" -> "lu", "alu" -> "e", "v" -> "alue",
    "a" -> "ta", "d" -> "ata", "a" -> "l", "al" -> "l",
    "m" -> "all", "s" -> "mall", "j" -> "o", "jo" -> "in",
    "f" -> "i", "fi" -> "l", "fil" -> "t", "filt" -> "er",
    "b" -> "i", "bi" -> "g", "g" -> "r", "gr" -> "o",
    "gro" -> "up", "a" -> "s", "as" -> "h", "h" -> "ash",
    "c" -> "u", "cu" -> "st", "cust" -> "o", "custo" -> "mer",
    "or" -> "t", "s" -> "ort", "d" -> "er", "or" -> "der")
  require(merges.forall { case (a, b) => a != b })
  require(merges.size == 64)

  /** Apply all merge ranks to one word. Words are expected lowercase
    * ASCII (callers filter `^[a-z]+$`), so char == codepoint and the
    * SQL `substr` split agrees with JVM char iteration. */
  def tokenize(word: String): Array[String] = {
    var toks = new Array[String](word.length)
    var i = 0
    while (i < word.length) { toks(i) = String.valueOf(word.charAt(i)); i += 1 }
    merges.foreach { case (a, b) =>
      val out = new Array[String](toks.length)
      var n = 0
      var j = 0
      while (j < toks.length) {
        if (j + 1 < toks.length && toks(j) == a && toks(j + 1) == b) {
          out(n) = a + b; n += 1; j += 2
        } else { out(n) = toks(j); n += 1; j += 1 }
      }
      toks = java.util.Arrays.copyOf(out, n)
    }
    toks
  }

  def compute(word: UTF8String): ArrayData = {
    val toks = tokenize(word.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def bpeTokens(word: Column): Column =
    Shim.column(BpeTokensExpr(Shim.expression(word)))

  /** The identical merge replay as generated DuckDB SQL: CTE `t0` splits
    * the distinct words of `wordsCte` (a CTE exposing `word`) into
    * (wid, pos, tok) rows; each rank r becomes CTE `t{r+1}` — one
    * lead/lag window pass merging `[a, b]` → `ab`. Exposes `_bpe_counts`
    * (wid, n_toks). */
  def countsCteSql(wordsCte: String): String = {
    val t0 =
      s"""t0 AS (
           SELECT word AS wid, CAST(i AS BIGINT) + 1 AS pos,
             substr(word, CAST(i AS INTEGER) + 1, 1) AS tok
           FROM (SELECT word, unnest(range(length(word))) AS i
                 FROM (SELECT DISTINCT word FROM $wordsCte)))"""
    val rounds = merges.zipWithIndex.map { case ((a, b), r) =>
      s"""t${r + 1} AS (
           SELECT wid, row_number() OVER (PARTITION BY wid ORDER BY pos)
               AS pos,
             CASE WHEN tok = '$a' AND nxt = '$b' THEN '$a$b' ELSE tok END
               AS tok
           FROM (
             SELECT wid, pos, tok,
               lead(tok) OVER (PARTITION BY wid ORDER BY pos) AS nxt,
               lag(tok) OVER (PARTITION BY wid ORDER BY pos) AS prv
             FROM t$r)
           WHERE prv IS NULL OR NOT (prv = '$a' AND tok = '$b'))"""
    }
    val counts =
      s"""_bpe_counts AS (
           SELECT wid, count(*) AS n_toks FROM t${merges.size}
           GROUP BY wid)"""
    (t0 +: rounds :+ counts).mkString(",\n")
  }
}

/** Native codegen'd BPE tokenizer (see [[Bpe]]): word → array of
  * subword tokens, one static call, stays in whole-stage codegen. */
case class BpeTokensExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(input: Any): Any =
    Bpe.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe.compute($c);")

  override protected def withNewChildInternal(c: Expression): BpeTokensExpr =
    copy(child = c)
}
