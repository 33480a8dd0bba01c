package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native ADC lookup-table builder: for each of `m` subspaces, the
  * squared-L2 distances from the vector's slice to all `ncode` LCG
  * centroids, in code order — `array<array<double>>` of shape m×ncode.
  *
  * Bit-for-bit equal to the declarative per-centroid chain (sequential
  * dim-order fold seeded 0.0, which the DuckDB oracle mirrors), but ONE
  * expression node instead of m×ncode×sub — the chain form put ~3k nodes
  * into the logical plan and re-paid seconds of driver-side
  * analysis/optimization on every execution. Wrong-length or
  * null-holding vectors yield all-zero tables (degenerate-input
  * contract shared with [[PqCodesExpr]]/[[LshBucketExpr]]).
  */
case class PqAdcTabsExpr(child: Expression, m: Int, ncode: Int, sub: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_pq_adc_tabs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    PqAdcTabsExpr.tabs(input.asInstanceOf[ArrayData], m, ncode, sub, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqAdcTabsExpr.tabs($c, $m, $ncode, $sub, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): PqAdcTabsExpr =
    copy(child = newChild)
}

object PqAdcTabsExpr {

  def tabs(v: ArrayData, m: Int, ncode: Int, sub: Int, isFloat: Boolean): ArrayData = {
    val dims = m * sub
    var ok = v.numElements() == dims
    var j = 0
    while (ok && j < dims) {
      if (v.isNullAt(j)) ok = false
      j += 1
    }
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val row = new Array[Double](ncode)
      if (ok) {
        var c = 0
        while (c < ncode) {
          var dist = 0.0
          var d = 0
          val cbase = (s.toLong * ncode + c) * sub
          val vbase = s * sub
          while (d < sub) {
            val x = if (isFloat) v.getFloat(vbase + d).toDouble else v.getDouble(vbase + d)
            val e = x - LshBucketExpr.hyperplane(cbase + d)
            dist += e * e
            d += 1
          }
          row(c) = dist
          c += 1
        }
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out)
  }
}
