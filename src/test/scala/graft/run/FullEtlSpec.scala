package graft.run

import graft.SparkSpec
import java.nio.file.Files

class FullEtlSpec extends SparkSpec {

  test("snapshot copy preserves counts and stamps the sign column") {
    val tgt = Files.createTempDirectory("etl").toString + "/orders"
    val (src, dst) = FullEtl.copyTable(spark,
      FullEtl.ParquetSource(s"$sf/orders.parquet"), tgt, withSign = true)
    assert(src == dst && src > 0)
    val out = spark.read.parquet(tgt)
    assert(out.columns.contains("sign"))
    assert(out.selectExpr("min(sign)", "max(sign)").collect().head.toSeq == Seq(1, 1))
  }

  test("jdbc source config builds partitioned reader options") {
    // No live DB in this container: assert the config shape only.
    val j = FullEtl.JdbcSource("jdbc:postgresql://h/db", "t", "u", "p",
      partitionColumn = Some("id"), numPartitions = 16)
    assert(j.numPartitions == 16 && j.partitionColumn.contains("id"))
  }
}
