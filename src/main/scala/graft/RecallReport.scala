package graft

import graft.ops.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality report for the ANN family: recall@k of each
  * approximate variant against exact brute-force cosine ground truth on
  * the embeddings table (all variants are oracle-gated for determinism;
  * this measures the other axis — how much of the true top-k the
  * approximation keeps, the number a user needs to pick nprobe/planes).
  *
  * Output: one JSON line, recall@k per variant plus the candidate-scan
  * fraction (probed corpus share) where the variant exposes it.
  *
  * Usage: runMain graft.RecallReport [sfDir] [nQueries] [k]
  */
object RecallReport {
  def main(args: Array[String]): Unit = {
    SettleGuard.install()
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1"))
    val nQueries = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Tables.session()
    val emb = Tables(spark, sfDir, "embeddings").cache()
    val queries = emb.filter(col("vec_id") < nQueries)

    val truth = SimilarityOps.bruteForceTopK(queries, emb, k)
      .select(col("query_id"), col("neighbor_id")).cache()
    // denominator = ACTUAL truth size, not nQueries*k: a corpus with fewer
    // than nQueries vectors (or fewer than k non-self neighbors) otherwise
    // understates every recall — a perfect variant reported < 1.0 — and an
    // empty truth divided to NaN, which is not even legal JSON
    val nTruth = truth.count()
    require(nTruth > 0, s"no ground-truth pairs: corpus at $sfDir has " +
      s"fewer than 2 vectors under vec_id < $nQueries")

    def recall(result: DataFrame): Double = {
      val hits = truth.join(
        result.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count()
      hits.toDouble / nTruth
    }

    // parameters mirror the gated queries (SparkEntry ann_*), scaled-up
    // corpus; nprobe/planes noted in the output for the SCALE.md table
    val variants: Seq[(String, String, () => DataFrame)] = Seq(
      ("lsh", "planes=4",
        () => SimilarityOps.lshTopK(queries, emb, k, planes = 4, dims = 64)),
      ("ivf_fixed", "nlist=8 nprobe=2",
        () => SimilarityOps.ivfTopKFixed(queries, emb, k, nlist = 8, nprobe = 2)),
      ("ivf_auto", "nlist/nprobe from ivfAutoParams(N)",
        () => SimilarityOps.ivfTopKAuto(queries, emb, k)),
      ("ivf_trained", "nlist=4 nprobe=2 iters=2",
        () => SimilarityOps.ivfTopKTrainedInt(queries, emb, k,
          nlist = 4, nprobe = 2, iters = 2, scale = 512)),
      ("pq", "m=8 ncode=16",
        () => SimilarityOps.pqTopK(queries, emb, k)),
      ("pq_trained", "m=8 ncode=16 iters=2",
        () => SimilarityOps.pqTopKTrainedInt(queries, emb, k,
          m = 8, ncode = 16, iters = 2, scale = 512)),
      ("ivfpq", "nlist=8 nprobe=2 m=8",
        () => SimilarityOps.ivfPqTopK(queries, emb, k)),
      ("ivfpq_res_32b", "nlist=16 nprobe=4 m=8 ncode=16 iters=3",
        () => SimilarityOps.ivfPqTopKTrainedInt(queries, emb, k,
          nlist = 16, nprobe = 4, m = 8, ncode = 16, iters = 3)),
      ("ivfpq_res_64b", "nlist=16 nprobe=4 m=8 ncode=256 iters=3",
        () => SimilarityOps.ivfPqTopKTrainedInt(queries, emb, k,
          nlist = 16, nprobe = 4, m = 8, ncode = 256, iters = 3)),
      ("ivfpq_res_128b", "nlist=16 nprobe=4 m=16 ncode=256 iters=3",
        () => SimilarityOps.ivfPqTopKTrainedInt(queries, emb, k,
          nlist = 16, nprobe = 4, m = 16, ncode = 256, iters = 3)))

    val rows = variants.map { case (name, params, fn) =>
      val r = recall(fn())
      System.err.println(f"[recall] $name%-12s $params%-28s recall@$k = $r%.3f")
      s""""$name":{"params":"$params","recall_at_$k":$r}"""
    }
    val n = emb.count()
    println(s"""{"metric":"ann_recall","k":$k,"n_queries":$nQueries,"corpus":$n,"sf":"$sfDir","variants":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
