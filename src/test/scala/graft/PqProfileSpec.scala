package graft

import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** Diagnostic: stage costs of the PQ ANN tiers. Not a correctness gate —
  * prints timings to stderr for plan iteration. The history it guards:
  * the declarative ADC-chain form put ~3k nodes into the logical plan
  * and cost ~1.7s of driver-side analysis per execution; the native
  * PqCodesExpr/PqAdcTabsExpr nodes brought the full query to
  * sub-second. Set GRAFT_PROFILE=1 to run.
  */
class PqProfileSpec extends SparkSpec {
  test("pq stage timings") {
    assume(sys.env.get("GRAFT_PROFILE").isDefined, "diagnostic only - set GRAFT_PROFILE=1 to run")
    val dir = "/root/testdata/sf0.1"
    val emb = Tables(spark, dir, "embeddings")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      System.err.println(f"[pq] $label%-28s " + ts.map(t => f"$t%6.2f").mkString(" "))
    }
    val codes = emb.select(col("vec_id"),
      SimilarityOps.pqCodes(col("embedding"), 8, 16, 8).as("_codes"))
    time("encode-only")(codes.write.format("noop").mode("overwrite").save())
    time("pqTopK full")(SparkEntry.queries("ann_pq_topk")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("ivfPqTopK full")(SparkEntry.queries("ann_ivfpq_topk")(spark, dir)
      .write.format("noop").mode("overwrite").save())
  }
}
