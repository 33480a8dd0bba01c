package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial rolling hash
  * (`fold(acc*31 + codepoint) mod P` — see [[CrossHash.polyHash]]).
  *
  * The pure-HOF formulation (`aggregate(transform(sequence(...), ascii ∘
  * substr))`) is semantically identical but allocates a UTF8String
  * substring per character in the interpreted HOF path — ~three orders of
  * magnitude slower on shingle-heavy inputs. This expression is one tight
  * JVM loop per string, participates in whole-stage codegen at top level,
  * and is equally cheap when invoked from inside a higher-order lambda.
  */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  // SQL-registered: wrong-typed input must fail at analysis, not as a
  // runtime ClassCastException / codegen compile error
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    // a bare NULL literal types as void — the expression returns NULL
    // for it (nullSafeEval), which generated CASE branches rely on
    case org.apache.spark.sql.types.NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PolyHashExpr.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashExpr.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHashExpr {
  final val P: Long = 1000000007L

  /** Unicode-codepoint fold — matches `ascii(substr(s,i,1))` in Spark and
    * DuckDB's `ascii(substr(...))` exactly. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}
