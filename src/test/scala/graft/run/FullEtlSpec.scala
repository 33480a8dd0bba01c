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

  test("reference round-trip golden: (1, 1.00) survives with exact decimal") {
    // FIXTURES.md §1 / reference tests/test_etl.py:20-36
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("amount", DecimalType(10, 2), nullable = true)))
    val tmp = Files.createTempDirectory("golden").toString
    spark.createDataFrame(
        java.util.List.of(Row(1, new java.math.BigDecimal("1.00"))), schema)
      .write.parquet(s"$tmp/test.parquet")
    val (s, c) = FullEtl.copyTable(spark,
      FullEtl.ParquetSource(s"$tmp/test.parquet"), s"$tmp/target")
    assert(s == 1 && c == 1)
    val row = spark.read.parquet(s"$tmp/target").collect().head
    assert(row.getInt(0) == 1)
    assert(row.getDecimal(1) == new java.math.BigDecimal("1.00"))
    assert(spark.read.parquet(s"$tmp/target").schema("amount").dataType ==
      DecimalType(10, 2)) // no precision loss, no skip_decimal workaround
  }

  test("jdbc source config builds partitioned reader options") {
    // No live DB in this container: assert the config shape only.
    val j = FullEtl.JdbcSource("jdbc:postgresql://h/db", "t", "u", "p",
      partitionColumn = Some("id"), numPartitions = 16)
    assert(j.numPartitions == 16 && j.partitionColumn.contains("id"))
  }

  test("partition bounds stringify as the integral literals Spark's parser accepts (r13)") {
    // r13 review finding: raw toString fed "123.45" / "1.2E+22" into
    // Spark's String.toLong bound parser. Floor/ceil keep the bounds
    // covering; out-of-Long-range returns None (single-partition
    // fallback — slower, never wrong).
    import FullEtl.boundLiteral
    assert(boundLiteral(new java.math.BigDecimal("123.45"), roundUp = false)
      .contains("123"))
    assert(boundLiteral(new java.math.BigDecimal("123.45"), roundUp = true)
      .contains("124"))
    assert(boundLiteral(new java.math.BigDecimal("-123.45"), roundUp = false)
      .contains("-124"))
    assert(boundLiteral(new java.math.BigDecimal("1.2E+22"), roundUp = true).isEmpty)
    assert(boundLiteral(java.lang.Double.valueOf(1.5e7), roundUp = false)
      .contains("15000000"))
    assert(boundLiteral(java.lang.Double.valueOf(1e300), roundUp = true).isEmpty)
    // NaN/Infinity bounds (float8 'Infinity' survives MAX) take the same
    // single-partition fallback instead of NumberFormatException
    assert(boundLiteral(java.lang.Double.valueOf(Double.NaN), roundUp = true).isEmpty)
    assert(boundLiteral(java.lang.Double.valueOf(Double.PositiveInfinity),
      roundUp = false).isEmpty)
    assert(boundLiteral(java.lang.Float.valueOf(Float.NegativeInfinity),
      roundUp = false).isEmpty)
    assert(boundLiteral(java.lang.Long.valueOf(42L), roundUp = false).contains("42"))
    assert(boundLiteral(java.sql.Date.valueOf("2020-01-02"), roundUp = true)
      .contains("2020-01-02")) // date/timestamp bounds pass through
  }
}
