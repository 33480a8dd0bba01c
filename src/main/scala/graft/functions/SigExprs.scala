package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

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

  override def checkInputDataTypes(): TypeCheckResult =
    SigExprs.requireStringArray(child, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Shared analysis-time gate: these expressions are SQL-registered, so a
  * wrong-typed argument must fail at analysis, not be reinterpreted as
  * UTF8String (offset,length) words at runtime. */
object SigExprs {
  def requireStringArray(child: Expression, name: String): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      // the empty/all-null literal `array()` types as array<void> — valid
      // input (documented empty-array semantics), nothing to misread
      case ArrayType(org.apache.spark.sql.types.NullType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<string>, got ${other.catalogString}")
    }
}

object SimHashExpr {
  /** 32-bit SimHash over the DISTINCT elements of `arr` (duplicates are
    * deduped here, so both raw token arrays and pre-deduped shingle
    * arrays produce the set-semantics signature). NULL elements are
    * skipped — the HOF twin's transform yields a null hash that the
    * vote aggregation ignores. */
  def sig(arr: ArrayData): Long = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[String](Math.max(16, n * 2))
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      val s = if (u == null) null else u.toString
      if (s != null && seen.add(s)) {
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

  override def checkInputDataTypes(): TypeCheckResult =
    SigExprs.requireStringArray(child, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    MinHashExpr.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashExpr.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

object MinHashExpr {
  private[functions] val A: Array[Long] = CrossHash.A.toArray
  private[functions] val B: Array[Long] = CrossHash.B.toArray
  private[functions] val P: Long = CrossHash.P

  /** NULL elements are skipped — array_min over the HOF twin's
    * transformed hashes ignores the null they map to. */
  def sig(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      if (u != null) {
        val h = PolyHashExpr.hash(u.toString)
        var j = 0
        while (j < k) {
          val v = (h * A(j) + B(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Fused MinHash band buckets: shingles → k permutation minima → per-band
  * bucket fold, one loop, one expression. Returns NULL for an empty
  * shingle array (mirroring the explode → groupBy form's row-dropping),
  * so `posexplode(graft_minhash_bands(...))` emits nothing for
  * shingle-less documents with NO separate size filter.
  *
  * The fusion is not (only) a constant-factor trick — it is a plan-shape
  * guard: a `Filter(size(...) > 0)` over an aliased signature column gets
  * the full expression tree substituted into it by predicate pushdown,
  * and `InferFiltersFromGenerate` + pushdown does the same below a
  * posexplode — each duplication re-evaluates grams+minima per row
  * (measured ~2× on the band queries). With the whole chain inside the
  * generator and nullability carrying the drop semantics, the optimizer
  * has nothing to duplicate.
  *
  * Bucket semantics are bit-identical to the HOF form the oracle mirrors:
  * `aggregate(slice(mh, b·rows+1, rows), b, (acc, v) -> (acc·31 + v) mod P)`.
  */
case class MinHashBandsExpr(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  require(k > 0 && k <= CrossHash.A.length,
    s"k ($k) must be in [1, ${CrossHash.A.length}]")
  require(bands > 0 && bands <= k && k % bands == 0,
    s"bands ($bands) must divide k ($k)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    SigExprs.requireStringArray(child, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    MinHashBandsExpr.buckets(input.asInstanceOf[ArrayData], k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashBandsExpr.buckets($c, $k, $bands);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

object MinHashBandsExpr {
  /** Band buckets of the k-minima signature; null for empty input. */
  def buckets(arr: ArrayData, k: Int, bands: Int): ArrayData = {
    if (arr.numElements() == 0) return null
    val mins = MinHashExpr.sig(arr, k)
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var r = 0
      while (r < rows) {
        acc = (acc * 31L + mins.getLong(b * rows + r)) % MinHashExpr.P
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}
