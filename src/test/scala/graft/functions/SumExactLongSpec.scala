package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SumExactLong.sumExact

/** Pins for the r16 exact-long sum that replaced the hot-path decimal
  * sums: exact equality with the decimal ground truth through the
  * overflow fold, SUM-compatible null semantics, the shuffle merge path,
  * and window-frame use. */
class SumExactLongSpec extends SparkSpec {

  test("equals decimal sum through the low-word overflow fold, mixed signs") {
    // values around Long.MaxValue/3 force a fold every ~3 rows; id%7
    // nulls and alternating signs exercise skip + both guard branches
    val df = spark.range(0, 100000)
      .select(
        when(col("id") % 7 === 0, lit(null)).otherwise(
          when(col("id") % 2 === 0, lit(Long.MaxValue / 3) - col("id"))
            .otherwise(-lit(Long.MaxValue / 4) - col("id"))).as("x"),
        (col("id") % 5).as("g"))
    val got = df.groupBy(col("g")).agg(sumExact(col("x")).as("s"))
      .orderBy("g").collect()
    val want = df.groupBy(col("g")).agg(sum(col("x").cast("decimal(38,0)")).as("s"))
      .orderBy("g").collect()
    assert(got.sameElements(want))
  }

  test("merge path: exact across many input partitions") {
    val df = spark.range(0, 50000).repartition(17)
      .select((lit(Long.MaxValue / 2) - col("id")).as("x"))
    val got = df.agg(sumExact(col("x"))).collect().head.getDecimal(0)
    val want = df.agg(sum(col("x").cast("decimal(38,0)"))).collect().head.getDecimal(0)
    assert(got == want)
  }

  test("SUM null semantics: all-null and empty groups yield NULL") {
    val allNull = spark.range(0, 10).select(lit(null).cast("long").as("x"))
      .agg(sumExact(col("x"))).collect().head
    assert(allNull.isNullAt(0))
    val empty = spark.range(0, 10).filter(col("id") < 0)
      .select(col("id").as("x")).agg(sumExact(col("x"))).collect().head
    assert(empty.isNullAt(0))
  }

  test("window frame: running totals equal the decimal window sum") {
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = spark.range(0, 5000)
      .select(col("id"), (col("id") % 13).as("g"), (col("id") * 997 - 1000).as("x"))
    val both = df.select(col("id"),
      sumExact(col("x")).over(w).as("a"),
      sum(col("x").cast("decimal(38,0)")).over(w).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
    assert(both.count() == 5000)
  }

  test("e2-grid equivalence on real money columns (q1 kernel)") {
    def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
    def dec4(c: org.apache.spark.sql.Column) = c.cast("decimal(4,2)")
    def e2(c: org.apache.spark.sql.Column) = (dec2(c) * 100).cast("long")
    val li = graft.Tables(spark, sf, "lineitem")
    val a = li.groupBy(col("l_returnflag"))
      .agg(sum(dec2(col("l_extendedprice")) *
        (lit(1).cast("decimal(4,2)") - dec4(col("l_discount"))) *
        (lit(1).cast("decimal(4,2)") + dec4(col("l_tax"))))
        .cast("double").as("v"))
      .orderBy("l_returnflag").collect()
    val b = li.groupBy(col("l_returnflag"))
      .agg((sumExact(e2(col("l_extendedprice")) * (lit(100L) - e2(col("l_discount")))
        * (lit(100L) + e2(col("l_tax")))) / 1000000).cast("double").as("v"))
      .orderBy("l_returnflag").collect()
    assert(a.sameElements(b))
  }
}
