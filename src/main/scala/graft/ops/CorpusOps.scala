package graft.ops

import graft.functions.CrossHash._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-management operators for training-data pipelines: deterministic
  * split assignment and corpus-level boilerplate detection. Both are
  * narrow/blocked designs — nothing materializes O(n²) and the only
  * shuffles are keyed aggregates with map-side partial combine.
  */
object CorpusOps {

  /** Deterministic train/val/test split by content-stable hash:
    * `bucket = polyHash(id) % 100`, then named ranges by cumulative
    * percentage. Reproducible across runs, engines and cluster sizes (no
    * RNG, no row order dependence), and stable under corpus growth — a
    * document never changes split when others are added, which is the
    * property `randomSplit` cannot give you.
    */
  def splitAssign(docs: DataFrame,
                  fractions: Seq[(String, Int)] = Seq("train" -> 98, "val" -> 1, "test" -> 1),
                  idCol: String = "doc_id"): DataFrame = {
    require(fractions.map(_._2).sum == 100, "fractions must sum to 100")
    require(fractions.nonEmpty)
    val bucket = polyHash(col(idCol).cast("string")) % lit(100L)
    val cumEnds = fractions.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val first = when(bucket < cumEnds.head, lit(fractions.head._1))
    val split = fractions.tail.zip(cumEnds.tail).dropRight(1)
      .foldLeft(first) { case (acc, ((name, _), end)) =>
        acc.when(bucket < end, lit(name))
      }
      .otherwise(lit(fractions.last._1))
    docs.select(col(idCol), bucket.cast("int").as("bucket"),
      (if (fractions.size == 1) lit(fractions.head._1) else split).as("split"))
  }

  /** Corpus vocabulary head: the `k` highest-document-frequency terms with
    * their document and occurrence counts — the standard first look at a
    * corpus before tokenizer training / stopword selection. One exploded
    * pass, one hash-aggregate with map-side combine, one top-k.
    */
  def vocabulary(docs: DataFrame, k: Int = 20, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val raw = docs.select(col(idCol),
      explode(tokens(lower(col(textCol)))).as("term"))
    raw.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"),
        count(lit(1)).as("tf"))
      .orderBy(col("df").desc, col("tf").desc, col("term").asc)
      .limit(k)
  }

  /** Boilerplate/duplication score: the fraction of a document's distinct
    * word n-grams that occur in more than `dfCap` documents. High values
    * flag template/near-boilerplate text — the corpus-level complement to
    * pairwise near-dup (one explode, one df aggregate, one join back;
    * never a pair join).
    */
  def duplicatedNgramFraction(docs: DataFrame, n: Int = 3, dfCap: Int = 1,
                              idCol: String = "doc_id",
                              textCol: String = "text"): DataFrame = {
    val ex = docs.select(col(idCol), explode(wordGrams(col(textCol), n)).as("g"))
    val dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("_df"))
    val per = ex.join(dfreq, "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_df") > dfCap, 1L).otherwise(0L)).as("n_dup"))
    // left join back: documents too short for any n-gram still get a row
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .na.fill(0L, Seq("n_grams", "n_dup"))
      .withColumn("dup_fraction",
        round(col("n_dup").cast("double") / greatest(col("n_grams"), lit(1L)), 6))
  }
}
