package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics in ONE compiled pass — the raw
  * counts behind [[graft.ops.TextOps.repetitionStats]]:
  * `(n_words, top word count, n_bigrams, top bigram count, duplicated
  * bigram occurrences)` over the whitespace tokens of the input.
  *
  * Semantically identical to the two explode → groupBy(doc, term) →
  * groupBy(doc) aggregation chains the DuckDB oracle runs, but map-only:
  * the explode form shuffles every (doc, token) and (doc, bigram)
  * occurrence — two full-corpus exchanges whose volume is the token
  * count, ~50× the document count — where this is a per-row hash count
  * inside the scan, zero exchanges. The sf10 rehearsal measured the
  * exploded form at 15 s (the bench's 5th-slowest query); the fused scan
  * removes both shuffles entirely.
  *
  * Empty / whitespace-only documents return all-zero counts (matching
  * the aggregation form's left-join + `na.fill(0)`).
  */
case class RepStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top_w", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_b", LongType, nullable = false),
    StructField("dup_b", LongType, nullable = false)))
  override def prettyName: String = "graft_rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepStatsExpr.stats(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepStatsExpr.stats($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
    copy(child = newChild)
}

object RepStatsExpr {
  def stats(s: String): InternalRow = {
    val tokens = s.split(' ').filter(_.nonEmpty)
    val nWords = tokens.length.toLong
    val wordCnt = new java.util.HashMap[String, Long](tokens.length * 2)
    var i = 0
    while (i < tokens.length) {
      wordCnt.merge(tokens(i), 1L, (a, b) => a + b)
      i += 1
    }
    var topW = 0L
    val wit = wordCnt.values().iterator()
    while (wit.hasNext) { val c = wit.next(); if (c > topW) topW = c }
    val nBigrams = math.max(0L, nWords - 1L)
    val biCnt = new java.util.HashMap[String, Long](tokens.length * 2)
    i = 0
    while (i + 2 <= tokens.length) {
      biCnt.merge(tokens(i) + " " + tokens(i + 1), 1L, (a, b) => a + b)
      i += 1
    }
    var topB = 0L
    var dupB = 0L
    val bit = biCnt.values().iterator()
    while (bit.hasNext) {
      val c = bit.next()
      if (c > topB) topB = c
      if (c > 1L) dupB += c
    }
    new GenericInternalRow(Array[Any](nWords, topW, nBigrams, topB, dupB))
  }
}
