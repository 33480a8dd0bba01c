package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Winnowing fingerprints over a token array in one pass (Schleimer,
  * Wilkerson & Aiken, SIGMOD 2003): n-gram shingle hashes, sliding-window
  * minima via a monotonic deque (O(#shingles) total), distinct minima out.
  *
  * Semantically equal to the HOF formulation the oracle mirrors —
  * `list_distinct(list_transform(range(...), i -> list_min(hashes[i:i+w-1])))`
  * — but the HOF form embeds the whole hash-array subtree inside the
  * per-window lambda, and Catalyst re-evaluates embedded subtrees per
  * element: every window recomputed every shingle hash, O(m²·n) per
  * document (measured 417 s for the corpus at sf0.1 vs <1 s here).
  */
case class WinnowExpr(child: Expression, n: Int, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowExpr.winnow(input.asInstanceOf[ArrayData], n, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowExpr.winnow($c, $n, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {

  def winnow(toks: ArrayData, n: Int, w: Int): ArrayData = {
    val m0 = toks.numElements()
    val sh = math.max(m0 - n + 1, 0)
    if (sh < w) return new GenericArrayData(Array.empty[Long])
    val hashes = new Array[Long](sh)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < sh) {
      sb.setLength(0)
      // concat_ws semantics: a null token drops WITH its separator (the
      // old form left a double space, diverging from the HOF/oracle gram)
      var j = 0
      var appended = 0
      while (j < n) {
        val u = toks.getUTF8String(i + j)
        if (u != null) {
          if (appended > 0) sb.append(' ')
          sb.append(u.toString)
          appended += 1
        }
        j += 1
      }
      hashes(i) = PolyHashExpr.hash(sb.toString)
      i += 1
    }
    // sliding-window minima with a monotonic deque; distinct in order
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < sh) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - w) deque.pollFirst()
      if (i >= w - 1) out.add(hashes(deque.peekFirst()))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }
}
