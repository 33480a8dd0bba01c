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

  test("countMin: estimates are one-sided (>= exact) and tight when sparse") {
    val events = (1 to 500).flatMap(i => Seq.fill(i % 7 + 1)((s"u$i", 1)))
      .toDF("k", "x")
    val exact = events.groupBy(col("k")).agg(count(lit(1)).as("n"))
    val probes = exact.select("k")
    // wide sketch: few collisions -> estimates ~exact; narrow: still >= exact
    for (w <- Seq(4096, 32)) {
      val est = SketchOps.countMin(events, "k", probes, width = w)
        .join(exact, "k")
        .select("cm_estimate", "n").as[(Long, Long)].collect()
      assert(est.forall { case (cm, n) => cm >= n },
        s"width=$w: count-min must never underestimate")
      if (w == 4096)
        assert(est.count { case (cm, n) => cm == n } > est.length * 9 / 10,
          "sparse sketch should be near-exact")
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
