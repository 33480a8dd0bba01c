package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct: estimates within HLL error bounds across cardinalities") {
    // m = 64 registers -> relative error ~1.04/sqrt(64) = 13%; allow 3 sigma
    for (n <- Seq(100, 1000, 5000)) {
      val df = (1 to n).map(i => (s"user$i", "g")).toDF("k", "grp")
      val est = SketchOps.hllDistinct(df, "k", Seq("grp"))
        .select("hll_estimate").as[Double].collect().head
      assert(math.abs(est - n) < 0.4 * n,
        s"n=$n estimate $est outside 40% envelope")
    }
  }

  test("hllDistinct: insensitive to duplication and partitioning") {
    val base = (1 to 800).map(i => (s"k$i", "g"))
    val dup = base ++ base ++ base
    val e1 = SketchOps.hllDistinct(base.toDF("k", "grp"), "k", Seq("grp"))
      .select("hll_estimate").as[Double].collect().head
    val e2 = SketchOps.hllDistinct(
        dup.toDF("k", "grp").repartition(7), "k", Seq("grp"))
      .select("hll_estimate").as[Double].collect().head
    assert(e1 == e2, "duplicates and partitioning must not move the estimate")
  }
}
