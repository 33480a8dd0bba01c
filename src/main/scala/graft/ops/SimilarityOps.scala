package graft.ops

import graft.functions.CrossHash._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers, per the standard scale playbook:
  *  - [[bruteForceTopK]] — exact cosine top-k; the query side is tiny and
  *    broadcast, so the corpus is scanned once with no shuffle of vectors.
  *    Right answer at any corpus size when |queries| is small.
  *  - [[lshTopK]] — random-hyperplane LSH bucketing: each vector lands in
  *    one signature bucket, candidates come only from the query's bucket
  *    (equi-join on the signature). At 100 TB the corpus-side bucketing is
  *    a one-off keyed write; per-query work is bucket-local.
  */
object SimilarityOps {

  /** Exact cosine top-k per query vector. `queries` and `corpus` both carry
    * (idCol, vecCol); self-matches are excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val joined = broadcast(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
      .crossJoin(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), round(col("cos"), 6).as("cos"))
  }

  /** Sign-of-projection LSH signature: `planes` deterministic hyperplanes
    * (shared with the oracle via the LCG in [[graft.functions.CrossHash]]),
    * one bit each, folded into a long bucket id.
    */
  def lshBucket(vec: org.apache.spark.sql.Column, planes: Int, dims: Int): org.apache.spark.sql.Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, pl) => {
        val dot = aggregate(
          zip_with(vec, sequence(lit(0), lit(dims - 1)),
            (x, d) => x.cast("double") * hyperplane(pl.cast("long"), d.cast("long"), dims)),
          lit(0.0d), (s, v) => s + v)
        acc * lit(2L) + when(dot >= 0, 1L).otherwise(lit(0L))
      })

  /** ANN top-k restricted to the query's LSH bucket. Approximate: recall
    * depends on `planes`; exact within the bucket.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 4,
              dims: Int = 64, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val joined = broadcast(qb).join(cb, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), round(col("cos"), 6).as("cos"))
  }
}
