package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a whitespace-tokenized string, as one native
  * expression.
  *
  * Semantically identical to the portable chain the oracle mirrors —
  * `array_distinct(transform(range, i -> concat_ws(' ', tok[i..i+n-1])))`
  * over `filter(split(trim(text),' '), length>0)` — but a single tight
  * loop per document instead of hundreds of interpreted lambda
  * evaluations. Distinctness is set-semantics; downstream consumers
  * (explode → aggregate) are order-insensitive.
  */
case class WordGramsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"

  override protected def nullSafeEval(input: Any): Any =
    WordGramsExpr.grams(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordGramsExpr.grams($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}

object WordGramsExpr {
  def grams(s: String, n: Int): ArrayData = {
    val tokens = s.split(' ').filter(_.nonEmpty)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= tokens.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      set.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}
