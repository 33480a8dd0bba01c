package graft

import graft.functions.{CosineSimExpr, LangScoresExpr, LshBucketExpr, PolyHashExpr, WordGramsExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Cluster deployment hook: `--conf spark.sql.extensions=graft.GraftExtensions`
  * injects the engine's native SQL functions into every session on the
  * cluster (the supported `SparkSessionExtensions` seam; for an existing
  * session use `org.apache.spark.sql.graftshim.FunctionRegistration`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, usage: String, b: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in"),
      b)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_polyhash",
      "polynomial rolling hash mod 1e9+7",
      exprs => PolyHashExpr(exprs.head)))
    ext.injectFunction(fn("graft_word_grams",
      "distinct word n-grams: graft_word_grams(text, n)",
      exprs => WordGramsExpr(exprs.head, exprs(1) match {
        case Literal(v: Int, _) => v
        case other => other.eval().toString.toInt
      })))
    ext.injectFunction(fn("graft_cosine",
      "exact cosine similarity of two numeric arrays",
      exprs => CosineSimExpr(exprs.head, exprs(1))))
    def litInt(e: Expression): Int = e match {
      case Literal(v: Int, _) => v
      case other => other.eval().toString.toInt
    }
    ext.injectFunction(fn("graft_lsh_bucket",
      "random-hyperplane LSH bucket: graft_lsh_bucket(vec, planes, dims)",
      exprs => LshBucketExpr(exprs.head, litInt(exprs(1)), litInt(exprs(2)))))
    ext.injectFunction(fn("graft_lang_scores",
      "per-language stopword hit counts over a token array",
      exprs => LangScoresExpr(exprs.head)))
  }
}
