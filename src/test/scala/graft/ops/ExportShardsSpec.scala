package graft.ops

import graft.SparkSpec
import graft.functions.CrossHash
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ExportShardsSpec extends SparkSpec {
  import spark.implicits._

  test("exportShards: one file per shard, stable membership, lossless") {
    val docs = graft.Tables(spark, sf, "documents")
    val n = docs.count()
    val out = Files.createTempDirectory("shards").toString
    CorpusOps.exportShards(docs, out, nShards = 8)

    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.length == 8, s"expected 8 shard dirs, got ${dirs.map(_.getName).toSeq}")
    dirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName} has ${parts.length} files, want 1")
    }

    val back = spark.read.parquet(out)
    assert(back.count() == n)
    // membership is the content-stable hash, not row order or partitioning
    val bad = back.filter(col("shard") =!=
      pmod(CrossHash.polyHash(col("doc_id").cast("string")), lit(8L)).cast("int"))
    assert(bad.count() == 0)

    // a re-export is byte-stable on membership
    val out2 = Files.createTempDirectory("shards2").toString
    CorpusOps.exportShards(docs, out2, nShards = 8)
    val a = back.select("doc_id", "shard").as[(Long, Int)].collect().toSet
    val b = spark.read.parquet(out2).select("doc_id", "shard").as[(Long, Int)].collect().toSet
    assert(a == b)
  }
}
