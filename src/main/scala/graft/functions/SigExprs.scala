package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native per-document signature expressions.
  *
  * A document signature (SimHash bits, MinHash minima) is a pure function
  * of the document's token/shingle set — there is no reason for it to
  * cost a shuffle. The explode → groupBy formulation (the obvious
  * DataFrame spelling) blows each document into hundreds of rows and
  * re-assembles them with a keyed exchange; these expressions compute the
  * same value in one tight loop inside the scan stage, so signature
  * queries become narrow scan-speed passes with zero exchanges.
  *
  * Hash semantics are bit-identical to the portable forms the DuckDB
  * oracle mirrors ([[PolyHashExpr.hash]] per element; votes via the
  * h % 2p ≥ p bit test, which equals (h >> b) & 1 for non-negative h;
  * permutations (a_j·h + b_j) mod P from [[CrossHash.A]]/[[CrossHash.B]]).
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  /** 32-bit SimHash over the DISTINCT elements of `arr` (duplicates are
    * deduped here, so both raw token arrays and pre-deduped shingle
    * arrays produce the set-semantics signature). */
  def sig(arr: ArrayData): Long = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[String](Math.max(16, n * 2))
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      if (seen.add(s)) {
        val h = PolyHashExpr.hash(s)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** MinHash signature: the k permutation minima of the element hashes, as
  * an array<long>. Duplicate elements are harmless (min is idempotent).
  * An EMPTY input array yields all-sentinel minima (Long.MaxValue) —
  * callers that must mirror the explode → groupBy form's row-dropping
  * semantics filter `size(arr) > 0` first.
  */
case class MinHashExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= CrossHash.A.length,
    s"k ($k) must be in [1, ${CrossHash.A.length}]: only ${CrossHash.A.length} " +
      "permutation coefficient pairs are defined (shared with the oracle)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    MinHashExpr.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashExpr.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

object MinHashExpr {
  private val A: Array[Long] = CrossHash.A.toArray
  private val B: Array[Long] = CrossHash.B.toArray
  private val P: Long = CrossHash.P

  def sig(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = PolyHashExpr.hash(arr.getUTF8String(i).toString)
      var j = 0
      while (j < k) {
        val v = (h * A(j) + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
