package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native product-quantization encoder: `m` subspace codes (argmin
  * squared-L2 centroid per `sub`-dim slice) over a numeric array, in one
  * tight codegen'd loop.
  *
  * Bit-for-bit equal to the declarative struct-argmin chain
  * ([[graft.ops.SimilarityOps.pqCodeHof]], which the DuckDB oracle
  * mirrors): per (subspace, centroid) the distance is a sequential
  * dim-order fold seeded 0.0 in double precision, and ties pick the
  * lowest code — but the chain form is m×ncode×sub expression nodes per
  * row (measured seconds per 20k vectors once past codegen limits);
  * this is the loop that encodes a 100 TB corpus at scan speed.
  *
  * Centroid components come from the exact-rational LCG
  * ([[LshBucketExpr.hyperplane]] at index `(s·ncode + c)·sub + d`), so
  * external engines derive identical codebooks from the formula alone.
  * Vectors of the wrong length (or with null cells) encode as all-zero
  * codes, mirroring [[LshBucketExpr]]'s degenerate-input contract.
  */
case class PqCodesExpr(child: Expression, m: Int, ncode: Int, sub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | org.apache.spark.sql.types.DoubleType, _) =>
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
    PqCodesExpr.codes(input.asInstanceOf[ArrayData], m, ncode, sub, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqCodesExpr.codes($c, $m, $ncode, $sub, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
}

object PqCodesExpr {

  def codes(v: ArrayData, m: Int, ncode: Int, sub: Int, isFloat: Boolean): ArrayData = {
    val out = new Array[Any](m)
    val dims = m * sub
    var ok = v.numElements() == dims
    var j = 0
    while (ok && j < dims) {
      if (v.isNullAt(j)) ok = false
      j += 1
    }
    if (!ok) {
      java.util.Arrays.fill(out, 0.asInstanceOf[Any])
      return new GenericArrayData(out)
    }
    var s = 0
    while (s < m) {
      var bestD = Double.PositiveInfinity
      var bestC = 0
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
        if (dist < bestD) { bestD = dist; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }
}
