package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of a string's codepoint distribution — the
  * gibberish/binary-noise detector among the quality signals: natural
  * language sits in a narrow entropy band (~2.5–4.5 nats), while base64
  * blobs, minified code and OCR noise land well outside it.
  *
  * One pass builds the histogram, then the fold runs over codepoints in
  * ASCENDING order — the same order the oracle's `list(cnt ORDER BY c)`
  * produces (UTF-8 byte order equals codepoint order), so the double sum
  * is bit-reproducible across engines up to libm `ln` (absorbed by the
  * caller's rounding). Empty input → 0.0. Codegen'd scalar: the quality
  * pass stays a narrow whole-stage scan at any corpus size.
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case org.apache.spark.sql.types.NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyExpr.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // explicit cast: a (non-foldable) NullType child declares its codegen
    // value as Object, and entropy(UTF8String) would fail javac, dropping
    // the whole stage to the interpreted fallback
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharEntropyExpr.entropy((org.apache.spark.unsafe.types.UTF8String) $c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropyExpr {
  def entropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      i += Character.charCount(cp)
      n += 1L
    }
    var acc = 0.0d
    val it = counts.values().iterator() // TreeMap: ascending codepoint order
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      acc += -p * Math.log(p)
    }
    acc
  }
}
