package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a whitespace-tokenized string, as one native
  * expression — distinct (set semantics, the shingle/dedup form) or
  * every occurrence in order (`distinct = false`, the counting form BPE
  * pair statistics need).
  *
  * Semantically identical to the portable chain the oracle mirrors —
  * `[array_distinct](transform(range, i -> concat_ws(' ', tok[i..i+n-1])))`
  * over `filter(split(trim(text),' '), length>0)` — but a single tight
  * loop per document instead of hundreds of interpreted lambda
  * evaluations (each of which re-tokenizes the document).
  */
case class WordGramsExpr(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case org.apache.spark.sql.types.NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordGramsExpr.grams(input.asInstanceOf[UTF8String].toString, n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordGramsExpr.grams($c.toString(), $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}

object WordGramsExpr {
  def grams(s: String, n: Int, distinct: Boolean): ArrayData = {
    val tokens = s.split(' ').filter(_.nonEmpty)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[String](tokens.length)
    val set = if (distinct) new java.util.HashSet[String] else null
    var i = 0
    while (i + n <= tokens.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      val g = sb.toString
      if (set == null || set.add(g)) out.add(g)
      i += 1
    }
    val arr = new Array[Any](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = UTF8String.fromString(out.get(k)); k += 1 }
    new GenericArrayData(arr)
  }
}
