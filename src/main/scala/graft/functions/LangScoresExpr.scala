package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** All per-language stopword-hit counts in one pass over a token array.
  *
  * Replaces five separate `filter(toks, isin(...))` HOF passes (one per
  * language — the slowest text op in round-1 bench): a single loop with a
  * word→languages lookup table counts every language at once. A token may
  * score for several languages ("de" is a Spanish article and a Mandarin
  * particle here), so each hit increments every matching language —
  * identical semantics to the per-language `countIn` it replaces.
  *
  * Output: counts in [[LangScoresExpr.stopwords]] order.
  */
case class LangScoresExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lang_scores"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    LangScoresExpr.checkTokens(child, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    LangScoresExpr.scores(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangScoresExpr.scores($c)")

  override protected def withNewChildInternal(newChild: Expression): LangScoresExpr =
    copy(child = newChild)
}

/** Argmax companion of [[LangScoresExpr]]: the winning (lang, score) pair
  * in one pass, ties broken by language code ascending. Returning the
  * final struct from a single expression matters: an `element_at(scores,
  * i)`-per-language projection gets re-inlined by CollapseProject, and
  * the token pipeline upstream is then re-evaluated once per language.
  */
case class LangBestExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LangScoresExpr.bestType
  override def prettyName: String = "graft_lang_best"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    LangScoresExpr.checkTokens(child, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    LangScoresExpr.best(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangScoresExpr.best($c)")

  override protected def withNewChildInternal(newChild: Expression): LangBestExpr =
    copy(child = newChild)
}

object LangScoresExpr {

  private[functions] def checkTokens(child: Expression, name: String) =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$name requires array<string> tokens, got ${other.catalogString}")
    }

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic
    * language guesser. Shared verbatim with the oracle SQL (single source
    * of truth — [[graft.ops.TextOps.stopwords]] aliases this).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "les", "des", "et"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  val nLangs: Int = stopwords.size

  /** word → indexes of the languages whose list contains it. */
  private val index: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    val tmp = scala.collection.mutable.Map.empty[String, List[Int]]
    stopwords.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach(w => tmp.update(w, i :: tmp.getOrElse(w, Nil)))
    }
    tmp.foreach { case (w, idxs) =>
      m.put(UTF8String.fromString(w), idxs.toArray)
    }
    m
  }

  def scores(toks: ArrayData): ArrayData = {
    val out = new Array[Int](nLangs)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val hit = index.get(toks.getUTF8String(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { out(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  val bestType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("score", IntegerType, nullable = false)))

  /** Languages sorted ascending with their score-array index — iteration
    * order makes the alphabetically-first language win ties. */
  private val langOrder: Array[(UTF8String, Int)] =
    stopwords.map(_._1).zipWithIndex.sortBy(_._1)
      .map { case (l, i) => (UTF8String.fromString(l), i) }.toArray

  def best(toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val sc = scores(toks)
    var bestLang: UTF8String = null
    var bestScore = Int.MinValue
    var i = 0
    while (i < langOrder.length) {
      val s = sc.getInt(langOrder(i)._2)
      if (s > bestScore) { bestScore = s; bestLang = langOrder(i)._1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestLang, bestScore))
  }
}
