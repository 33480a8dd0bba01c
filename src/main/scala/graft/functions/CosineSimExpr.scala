package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity between two numeric arrays.
  *
  * Bit-for-bit equal to the portable HOF formulation
  * ([[CrossHash.cosine]]'s strict left folds, which the DuckDB oracle
  * mirrors): dot and the two norms are sequential index-order folds in
  * double precision, so `dot/(√na·√nb)` is IEEE-identical across engines.
  * One tight loop per row instead of three interpreted lambda folds.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cosine requires array<float|double> on both sides, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cosRes")
      s"""java.lang.Double $r = graft.functions.CosineSimExpr.cos(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Boxed so null can propagate exactly like the HOF form: `zip_with`
    * pads mismatched lengths with null and a null element nullifies the
    * fold, so length mismatch or any null element → NULL result. */
  def cos(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    var j = 0
    val m = a.numElements()
    while (j < m) {
      if (a.isNullAt(j) || b.isNullAt(j)) return null
      j += 1
    }
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    var na = 0.0
    i = 0
    val an = a.numElements()
    while (i < an) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      na += x * x
      i += 1
    }
    var nb = 0.0
    i = 0
    val bn = b.numElements()
    while (i < bn) {
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
