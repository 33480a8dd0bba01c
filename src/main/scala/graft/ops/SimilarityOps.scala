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

  /** IVF (inverted-file) ANN: a coarse k-means quantizer over the corpus,
    * then exact cosine top-k probing only the `nprobe` nearest centroid
    * lists per query — the standard scale path when the corpus outgrows
    * brute force.
    *
    * Scale shape: centroids are tiny (nlist × dims doubles) and live on the
    * driver/broadcast; every corpus pass is a broadcast nearest-centroid
    * assignment (no shuffle of vectors); list membership is a keyed column
    * so the probe is an equi-join on `cid`. Lloyd iterations are fixed
    * (`iters`) with deterministic lowest-id seeding.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nlist: Int = 16,
              nprobe: Int = 4, iters: Int = 3, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    def centroidDf(cents: Seq[(Int, Seq[Double])]) =
      broadcast(cents.toDF("cid", "cvec"))

    /** Nearest centroid id for each row of `df` (broadcast cross join +
      * per-row argmax window). */
    def assign(df: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame = {
      val w = Window.partitionBy(col("_aid"))
        .orderBy(col("_sim").desc, col("cid").asc)
      df.select(col(idCol).as("_aid"), col(vecCol).as("_v"))
        .crossJoin(centroidDf(cents))
        .withColumn("_sim", cosine(col("_v"), col("cvec")))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("_aid").as(idCol), col("_v").as(vecCol), col("cid"))
    }

    // Deterministic seeding: the nlist lowest-id corpus vectors.
    var cents: Seq[(Int, Seq[Double])] = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(vecCol)).collect().zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Float](0).map(_.toDouble))
      }.toSeq

    // Fixed Lloyd iterations; mean per (centroid, dim) via explode+avg.
    for (_ <- 0 until iters) {
      val assigned = assign(corpus, cents)
      val means = assigned
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val byCid = means.groupBy(_.getInt(0))
      cents = cents.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val m = old.toArray.clone()
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            (cid, m.toSeq)
          case None => (cid, old) // empty list keeps its seed
        }
      }
    }

    // Final inverted lists + nprobe probe lists per query.
    val lists = assign(corpus, cents)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cid"))
    val probeW = Window.partitionBy(col("_qid"))
      .orderBy(col("_sim").desc, col("cid").asc)
    val probes = queries.select(col(idCol).as("_qid"), col(vecCol).as("qv"))
      .crossJoin(centroidDf(cents))
      .withColumn("_sim", cosine(col("qv"), col("cvec")))
      .withColumn("_rn", row_number().over(probeW))
      .filter(col("_rn") <= nprobe)
      .select(col("_qid").as("query_id"), col("qv"), col("cid"))

    val joined = broadcast(probes).join(lists, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), round(col("cos"), 6).as("cos"))
  }

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
