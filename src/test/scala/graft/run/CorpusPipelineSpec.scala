package graft.run

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end pipeline composition over the real sf0.001 corpus: stages
  * prune monotonically, the export is lossless vs the final survivors,
  * and re-running is deterministic.
  */
class CorpusPipelineSpec extends SparkSpec {

  test("pipeline stages prune monotonically and export losslessly") {
    val docs = graft.Tables(spark, sf, "documents")
    val evalSet = docs.limit(3).select(col("doc_id"), col("text"))
    val out = java.nio.file.Files.createTempDirectory("graft-pipeline").toString
    val report = CorpusPipeline.run(docs, out,
      CorpusPipeline.Config(minTokens = 5L,
        mixtureRates = Map("src0" -> 0.5), nShards = 4),
      evalDocs = Some(evalSet))

    val byStage = report.map(s => s.stage -> s.rows).toMap
    assert(report.map(_.stage) == Seq("input", "quality_filter", "exact_dedup",
      "near_dedup", "decontaminate", "mixture", "split_assign", "sharded[4]"))
    // r13 review: the sharded row's rows field is the EXPORTED document
    // count like every other stage (it used to hold the shard count,
    // which read as a near-total drop at export)
    assert(byStage("sharded[4]") == byStage("split_assign"))
    // monotone pruning through the document stages
    val chain = Seq("input", "quality_filter", "exact_dedup", "near_dedup",
      "decontaminate", "mixture", "split_assign").map(byStage)
    assert(chain.zip(chain.tail).forall { case (a, b) => b <= a },
      s"stage counts must not grow: $chain")
    assert(byStage("input") == 500L)
    // the eval set's own documents (and their near-dups) are gone
    assert(byStage("decontaminate") < byStage("near_dedup"))

    // export round-trip: same rows, stable shard membership
    val exported = spark.read.parquet(out)
    assert(exported.count() == byStage("split_assign"))
    assert(exported.select("split").distinct().count() >= 1)
    val shardCounts = exported.groupBy("shard").count().count()
    assert(shardCounts <= 4)

    // deterministic: a second run reports identical counts
    val out2 = java.nio.file.Files.createTempDirectory("graft-pipeline2").toString
    val report2 = CorpusPipeline.run(docs, out2,
      CorpusPipeline.Config(minTokens = 5L,
        mixtureRates = Map("src0" -> 0.5), nShards = 4),
      evalDocs = Some(evalSet))
    assert(report2 == report)
  }

  test("optional paragraph stage rewrites docs and leaves no cross-doc paragraph") {
    val docs = graft.Tables(spark, sf, "documents")
    val out = java.nio.file.Files.createTempDirectory("graft-pipeline-para").toString
    val report = CorpusPipeline.run(docs, out,
      CorpusPipeline.Config(minTokens = 1L, paragraphSep = Some(" the "),
        nShards = 2))
    val byStage = report.map(s => s.stage -> s.rows).toMap
    assert(report.map(_.stage).contains("paragraph_dedup"))
    assert(byStage("paragraph_dedup") <= byStage("exact_dedup"))

    // invariant: after the stage, every non-empty paragraph is globally
    // unique across the exported corpus
    val exported = spark.read.parquet(out)
    val paraDup = exported
      .select(explode(split(col("text"), " the ")).as("p"))
      .filter(trim(col("p")) =!= "")
      .groupBy(col("p")).count().filter(col("count") > 1).count()
    assert(paraDup == 0L, s"$paraDup duplicated paragraphs survived")
  }
}
