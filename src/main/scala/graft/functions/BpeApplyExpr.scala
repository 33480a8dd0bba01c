package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge list ([[graft.ops.CorpusOps.bpeLearn]]'s
  * output order) to a word-token array: each word becomes its subword
  * symbols (chars + `</w>`, merged greedily left-to-right per merge, in
  * merge order — the classic Sennrich apply loop), flattened across the
  * document. One codegen'd pass per row, merges held as expression state
  * (a broadcast-equivalent: they ride the serialized plan, never a join)
  * — tokenization stays a narrow scan-stage projection at any corpus
  * size. O(|merges| · word length) per word; cache-friendly because the
  * whole loop runs on one word's small array.
  */
case class BpeApplyExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_apply"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SigExprs.requireStringArray(child, prettyName)

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  def applyAll(input: ArrayData): ArrayData = {
    val nWords = input.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var w = 0
    while (w < nWords) {
      val u = input.getUTF8String(w)
      // null words contribute no symbols (tokens() never yields them, but
      // the expression is public API over any array<string> — an NPE here
      // would kill the whole job)
      if (u != null) {
        val word = u.toString
        var syms = {
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < word.length) {
            val cp = word.codePointAt(i)
            b += new String(Character.toChars(cp))
            i += Character.charCount(cp)
          }
          b += "</w>"
          b
        }
        var m = 0
        while (m < mergeArr.length) {
          val (a, bSym) = mergeArr(m)
          // greedy left-to-right, skip both symbols after a merge
          val next = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == bSym) {
              next += a + bSym; i += 2
            } else { next += syms(i); i += 1 }
          }
          syms = next
          m += 1
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    applyAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApplyExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.applyAll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyExpr =
    copy(child = newChild)
}
