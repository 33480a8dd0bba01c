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

  test("countMin: a probe key absent from the corpus estimates 0, not an inflated min") {
    // regression: the inner join dropped empty (zero-count) cells, so a
    // never-seen key took min() over only its COLLIDING cells — inflated,
    // or missing from the output entirely when no cell collided
    val events = Seq.fill(100)(("hot", 1)).toDF("k", "x")
    val probes = Seq(("hot", 1), ("never-seen-key", 1)).toDF("k", "x").select("k")
    val est = SketchOps.countMin(events, "k", probes, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size == 2, "every probe key must produce an estimate row")
    assert(est("hot") == 100L)
    assert(est("never-seen-key") == 0L,
      "an absent key with any empty cell must estimate 0 (min over d rows)")
  }

  test("hllDistinct: NULL keys are ignored, like COUNT(DISTINCT)") {
    // regression: a NULL key hashed to a NULL register row that count(*)
    // saw but sum skipped — off-by-one empty-register term, and with all
    // 64 registers hit the raw estimator went NEGATIVE
    val withNulls = ((1 to 500).map(i => (Some(s"u$i"), "g")) ++
      Seq((Option.empty[String], "g"), (Option.empty[String], "g")))
      .toDF("k", "grp")
    val clean = (1 to 500).map(i => (s"u$i", "g")).toDF("k", "grp")
    val a = SketchOps.hllDistinct(withNulls, "k", Seq("grp"))
      .select("hll_estimate").as[Double].collect().head
    val b = SketchOps.hllDistinct(clean, "k", Seq("grp"))
      .select("hll_estimate").as[Double].collect().head
    assert(a == b, "null keys must not perturb the estimate")
    assert(a > 0, "estimate must stay positive")
  }

  test("histogramQuantiles: within one bucket width of the exact percentile") {
    val rnd = new scala.util.Random(7)
    val vals = (1 to 2000).map(_ => ("g", math.abs(rnd.nextInt(1000)).toLong))
    val df = vals.toDF("grp", "v")
    val est = SketchOps.histogramQuantiles(df, "v", Seq("grp"),
        maxValue = 1024L, nBuckets = 64, qs = Seq(50, 95))
      .select("p50", "p95").as[(Long, Long)].collect().head
    val sorted = vals.map(_._2).sorted
    val width = 1024L / 64
    def exact(q: Double) = sorted((q * (sorted.length - 1)).toInt)
    assert(math.abs(est._1 - exact(0.50)) <= width,
      s"p50 ${est._1} vs exact ${exact(0.50)}")
    assert(math.abs(est._2 - exact(0.95)) <= width,
      s"p95 ${est._2} vs exact ${exact(0.95)}")
    // estimates are bucket upper edges: monotone with q
    assert(est._1 <= est._2)
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

  test("heavyHitters: NULL keys are excluded instead of crashing the sketch build") {
    // regression: polyHash(null) is null, so a null key's cells were null
    // rows whose driver-side getLong NPE'd the whole job
    val df = (Seq.fill(10)(Option("hot")) ++ Seq.fill(3)(Option("cold")) ++
      Seq.fill(5)(Option.empty[String])).toDF("k")
    val hits = SketchOps.heavyHitters(df, "k", threshold = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(hits == Set(("hot", 10L)))
  }

  test("histogramQuantiles: out-of-contract negative values clamp to bucket 0") {
    // regression: a negative value produced bucket -1 and silently
    // corrupted the cumulative histogram
    val clean = Seq.tabulate(100)(i => ("g", i.toLong)).toDF("grp", "v")
    val dirty = clean.union(Seq(("g", -1L), ("g", -500L)).toDF("grp", "v"))
    def q50(df: org.apache.spark.sql.DataFrame) =
      SketchOps.histogramQuantiles(df, "v", Seq("grp"), maxValue = 128L)
        .select("p50").as[Long].collect().head
    // the two negatives land in bucket 0 (as if 0), shifting mass low by
    // exactly two values — never a negative bucket or edge
    val est = q50(dirty)
    assert(est >= 0L, s"negative quantile edge: $est")
    assert(math.abs(est - q50(clean)) <= 2L * 2L, "clamped values behave like zeros")
  }
}
