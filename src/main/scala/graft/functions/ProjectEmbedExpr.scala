package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native random-projection of a numeric array onto `planes` deterministic
  * LCG hyperplanes — the dense-output sibling of [[LshBucketExpr]] (same
  * hyperplanes, raw dot products instead of sign bits). Used to compress
  * embeddings before storage/ANN: Johnson–Lindenstrauss says k random
  * projections preserve pairwise geometry to within ~sqrt(1/k), and
  * because the planes are derived from a fixed LCG the compressed vectors
  * are reproducible across runs, engines and cluster sizes.
  *
  * Each per-plane dot product is a sequential index-order fold of
  * `vec[d] * hyperplane(plane, d)` in double precision — bit-for-bit what
  * the DuckDB oracle computes with list_reduce over the same dyadic-
  * rational plane components. One tight codegen'd JVM loop per row; no
  * interpreted lambda calls in what is a per-row hot path on a 100 TB
  * corpus.
  *
  * Malformed vectors (length != dims, or a null element) project to the
  * all-zero vector, mirroring [[LshBucketExpr]]'s bucket-0 convention for
  * the same inputs.
  */
case class ProjectEmbedExpr(child: Expression, planes: Int, dims: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_project_embed"

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
    ProjectEmbedExpr.project(input.asInstanceOf[ArrayData], planes, dims, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ProjectEmbedExpr.project($c, $planes, $dims, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): ProjectEmbedExpr =
    copy(child = newChild)
}

object ProjectEmbedExpr {

  def project(v: ArrayData, planes: Int, dims: Int, isFloat: Boolean): ArrayData = {
    val out = new Array[Double](planes)
    var ok = v.numElements() == dims
    var j = 0
    while (ok && j < dims) {
      if (v.isNullAt(j)) ok = false
      j += 1
    }
    if (ok) {
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var d = 0
        val base = p.toLong * dims
        while (d < dims) {
          val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
          dot += x * LshBucketExpr.hyperplane(base + d)
          d += 1
        }
        out(p) = dot
        p += 1
      }
    }
    new GenericArrayData(out)
  }
}
