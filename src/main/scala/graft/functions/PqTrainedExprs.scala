package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native PQ encode/ADC against RUNTIME-TRAINED integer codebooks.
  *
  * The fixed-codebook twins ([[PqCodesExpr]]/[[PqAdcTabsExpr]]) bake the
  * LCG formula into the loop; these take the trained books as a flat
  * `Array[Long]` (layout `[(s·ncode + c)·sub + d]`) carried as a codegen
  * reference object — ONE compiled loop and ONE plan node regardless of
  * `ncode`, where the declarative struct-argmin form is m×ncode struct
  * nodes (ncode=256 would put ~4k nodes in the plan and minutes into
  * driver-side analysis). Books are driver state (≤ m·ncode·sub longs —
  * 16 KB at 8×256×8); queries/corpus never shuffle for encoding.
  *
  * Both operate on the exact integer quantization grid
  * (`floor(x·scale)` codes, input `array<bigint>`): distances are exact
  * integer squared-L2, argmin ties take the lowest code — the same
  * order-independent contract as [[graft.ops.SimilarityOps.ivfTopKTrainedInt]],
  * so a SQL oracle replays training AND encoding bit-for-bit.
  * Wrong-length or null-holding inputs encode as all-zero codes / tables
  * (the shared degenerate-input contract).
  */
case class PqEncodeExpr(child: Expression, books: Array[Long],
                        m: Int, ncode: Int, sub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode_trained"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> grid codes, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PqTrainedExprs.encode(input.asInstanceOf[ArrayData], books, m, ncode, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqTrainedExprs.encode($c, $ref, $m, $ncode, $sub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Per-query ADC tables against trained books: `array<array<bigint>>` of
  * shape m×ncode, `tabs[s][c]` = exact integer squared-L2 from the
  * query's subspace-s grid slice to book centroid (s, c). See
  * [[PqEncodeExpr]] for the layout/contract. */
case class PqAdcTrainedExpr(child: Expression, books: Array[Long],
                            m: Int, ncode: Int, sub: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_pq_adc_trained"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> grid codes, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PqTrainedExprs.tabs(input.asInstanceOf[ArrayData], books, m, ncode, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqTrainedExprs.tabs($c, $ref, $m, $ncode, $sub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTrainedExpr =
    copy(child = newChild)
}

object PqTrainedExprs {

  private def valid(v: ArrayData, dims: Int): Boolean = {
    if (v.numElements() != dims) return false
    var j = 0
    while (j < dims) {
      if (v.isNullAt(j)) return false
      j += 1
    }
    true
  }

  def encode(v: ArrayData, books: Array[Long], m: Int, ncode: Int,
             sub: Int): ArrayData = {
    val out = new Array[Any](m)
    if (!valid(v, m * sub)) {
      java.util.Arrays.fill(out, 0.asInstanceOf[Any])
      return new GenericArrayData(out)
    }
    var s = 0
    while (s < m) {
      var bestD = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < ncode) {
        var dist = 0L
        var d = 0
        val cbase = (s * ncode + c) * sub
        while (d < sub) {
          val diff = v.getLong(s * sub + d) - books(cbase + d)
          dist += diff * diff
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

  def tabs(v: ArrayData, books: Array[Long], m: Int, ncode: Int,
           sub: Int): ArrayData = {
    val rows = new Array[Any](m)
    val ok = valid(v, m * sub)
    var s = 0
    while (s < m) {
      val row = new Array[Any](ncode)
      var c = 0
      while (c < ncode) {
        var dist = 0L
        if (ok) {
          var d = 0
          val cbase = (s * ncode + c) * sub
          while (d < sub) {
            val diff = v.getLong(s * sub + d) - books(cbase + d)
            dist += diff * diff
            d += 1
          }
        }
        row(c) = dist
        c += 1
      }
      rows(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(rows)
  }
}
