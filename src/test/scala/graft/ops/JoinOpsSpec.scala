package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    // (event, key, ts)
    ("e1", 1L, 100L), ("e2", 1L, 250L), ("e3", 1L, 50L),
    ("e4", 2L, 500L), ("e5", 3L, 10L)
  ).toDF("ev", "k", "ts")

  private def right = Seq(
    // (key, ts, id, price)
    (1L, 100L, 11L, 1.0), (1L, 200L, 12L, 2.0),
    (2L, 400L, 21L, 3.0), (2L, 600L, 22L, 4.0)
  ).toDF("rk", "rts", "oid", "price")

  test("backward as-of picks the most recent right row at-or-before leftTs") {
    val out = JoinOps.asofJoin(left, right, "k", "rk", "ts", "rts",
        payloadCols = Seq("oid", "price"), tieBreak = "oid")
      .select("ev", "oid", "price").as[(String, Long, Double)]
      .collect().map { case (e, o, p) => e -> ((o, p)) }.toMap
    // e1 at ts=100 matches the rts=100 row INCLUSIVELY; e2 the rts=200 row;
    // e3 precedes every right row and is dropped (inner); e4 gets rts=400;
    // e5's key has no right rows at all
    assert(out == Map("e1" -> (11L, 1.0), "e2" -> (12L, 2.0), "e4" -> (21L, 3.0)))
  }

  test("forward as-of picks the nearest right row at-or-after leftTs") {
    val out = JoinOps.asofJoin(left, right, "k", "rk", "ts", "rts",
        payloadCols = Seq("oid", "price"), tieBreak = "oid",
        direction = "forward")
      .select("ev", "oid", "price").as[(String, Long, Double)]
      .collect().map { case (e, o, p) => e -> ((o, p)) }.toMap
    // e1 at ts=100 matches rts=100 INCLUSIVELY; e2 at 250 has no later
    // right row for key 1 and drops (inner); e3 at 50 gets rts=100;
    // e4 at 500 gets rts=600; e5's key has no right rows
    assert(out == Map("e1" -> (11L, 1.0), "e3" -> (11L, 1.0), "e4" -> (22L, 4.0)))
  }

  test("forward as-of agrees with the naive formulation on real tables") {
    // orders predate every event, so forward-match orders → first event
    // at-or-after the order date (the nonempty direction on this data)
    val orders = graft.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")).limit(2000)
    val ev = graft.Tables(spark, sf, "events")
    val fast = JoinOps.asofJoin(orders, ev, "o_custkey", "user_id",
        "o_orderdate", "ts", Seq("event_id"), tieBreak = "event_id",
        direction = "forward")
      .select("o_orderkey", "event_id").as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_orderkey"))
      .orderBy(col("ts").asc, col("event_id").desc)
    val naive = orders.join(ev, col("o_custkey") === col("user_id") &&
        col("ts") >= col("o_orderdate"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("o_orderkey", "event_id").as[(Long, Long)].collect().toMap
    assert(fast == naive && fast.nonEmpty)
  }

  test("nearest as-of picks the smaller absolute gap, backward on ties") {
    val out = JoinOps.asofJoin(left, right, "k", "rk", "ts", "rts",
        payloadCols = Seq("oid", "price"), tieBreak = "oid",
        direction = "nearest")
      .select("ev", "oid").as[(String, Long)].collect().toMap
    // e1 ts=100: backward rts=100 gap 0 wins over forward rts=200;
    // e2 ts=250: backward 200 (gap 50), no forward → 12;
    // e3 ts=50: only forward 100 → 11;
    // e4 ts=500: backward 400 (gap 100) exactly ties forward 600 (gap 100)
    //           → backward preferred → 21; e5: no right rows at all
    assert(out == Map("e1" -> 11L, "e2" -> 12L, "e3" -> 11L, "e4" -> 21L))
    // exact-tie preference flips with the data: forward strictly closer
    val r2 = Seq((2L, 420L, 31L, 1.0), (2L, 560L, 32L, 2.0))
      .toDF("rk", "rts", "oid", "price")
    val n2 = JoinOps.asofJoin(Seq(("x", 2L, 500L)).toDF("ev", "k", "ts"),
        r2, "k", "rk", "ts", "rts", Seq("oid", "price"), tieBreak = "oid",
        direction = "nearest")
      .select("oid").as[Long].collect().toSeq
    assert(n2 == Seq(32L)) // gap 60 forward < gap 80 backward
  }

  test("keepUnmatched retains left rows with null payload") {
    val out = JoinOps.asofJoin(left, right, "k", "rk", "ts", "rts",
        payloadCols = Seq("oid", "price"), tieBreak = "oid",
        keepUnmatched = true)
    assert(out.count() == 5)
    val unmatched = out.filter(col("oid").isNull)
      .select("ev").as[String].collect().toSet
    assert(unmatched == Set("e3", "e5"))
  }

  test("inner as-of keeps a matched right row whose payload value is null") {
    // matched-ness is the matched ROW's existence, not a payload field's
    // nullness: oid is null in the only right row, yet e1 matched it
    val r = Seq((1L, 100L, Option.empty[java.lang.Long], 5.0))
      .toDF("rk", "rts", "oid", "price")
    val out = JoinOps.asofJoin(Seq(("e1", 1L, 150L)).toDF("ev", "k", "ts"),
        r, "k", "rk", "ts", "rts",
        payloadCols = Seq("oid", "price"), tieBreak = "price")
      .select("ev", "price").as[(String, Double)].collect()
    assert(out.toSeq == Seq(("e1", 5.0)))
  }

  test("ties on (key, rightTs) resolve to the largest tieBreak value") {
    val dupRight = Seq((1L, 100L, 11L, 1.0), (1L, 100L, 19L, 9.0))
      .toDF("rk", "rts", "oid", "price")
    val out = JoinOps.asofJoin(Seq(("e1", 1L, 150L)).toDF("ev", "k", "ts"),
        dupRight, "k", "rk", "ts", "rts",
        payloadCols = Seq("oid", "price"), tieBreak = "oid")
      .select("oid", "price").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((19L, 9.0)))
  }

  test("as-of agrees with the naive row-amplifying formulation on real tables") {
    val ev = graft.Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = graft.Tables(spark, sf, "orders")
    val fast = JoinOps.asofJoin(ev, ord, "user_id", "o_custkey",
        "ts", "o_orderdate",
        payloadCols = Seq("o_orderkey", "o_totalprice", "o_orderdate"),
        tieBreak = "o_orderkey")
      .select("event_id", "o_orderkey")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val naive = ev.join(ord,
        col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("event_id", "o_orderkey")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("rangeJoin: inclusive bounds, bucket-boundary crossing, key isolation") {
    val pts = Seq(
      ("p1", 1L, 100L), ("p2", 1L, 150L), ("p3", 1L, 151L),
      ("p4", 2L, 120L), ("p5", 1L, 99L)
    ).toDF("pid", "k", "t")
    val ivs = Seq(
      ("i1", 1L, 100L, 150L), // [100,150] spans buckets 10..15 at width 10
      ("i2", 2L, 110L, 130L)
    ).toDF("iid", "ik", "s", "e")
    val out = JoinOps.rangeJoin(pts, ivs, "t", "s", "e", bucket = 10L,
        leftKey = Some("k"), rightKey = Some("ik"))
      .select("pid", "iid").as[(String, String)].collect().toSet
    // p1 at start bound and p2 at end bound are IN; p3 (end+1) and p5
    // (start-1) are out; p4 matches only its own key's interval
    assert(out == Set(("p1", "i1"), ("p2", "i1"), ("p4", "i2")))
  }

  test("rangeJoin and intervalJoin accept the SAME key column name on both sides") {
    // regression: col(lk) === col(rk) resolved against both join children
    // and threw AMBIGUOUS_REFERENCE for the natural same-named key
    val pts = Seq(("p1", 1L, 100L), ("p2", 2L, 120L)).toDF("pid", "user_id", "t")
    val ivs = Seq(("i1", 1L, 90L, 110L), ("i2", 2L, 115L, 125L))
      .toDF("iid", "user_id", "s", "e")
    val out = JoinOps.rangeJoin(pts, ivs, "t", "s", "e", bucket = 10L,
        leftKey = Some("user_id"), rightKey = Some("user_id"))
      .select("pid", "iid").as[(String, String)].collect().toSet
    assert(out == Set(("p1", "i1"), ("p2", "i2")))
    val li = Seq(("a", 1L, 100L, 120L)).toDF("lid", "user_id", "ls", "le")
    val ri = Seq(("b", 1L, 110L, 130L), ("c", 2L, 110L, 130L))
      .toDF("rid", "user_id", "rs", "re")
    val iv = JoinOps.intervalJoin(li, ri, "ls", "le", "rs", "re", bucket = 10L,
        leftKey = Some("user_id"), rightKey = Some("user_id"))
      .select("lid", "rid").as[(String, String)].collect().toSet
    assert(iv == Set(("a", "b")))
  }

  test("asofJoin rejects left columns that collide with internal names") {
    // regression: a left data column named _t (or _k/_tag/_r/_l/_m) was
    // restored from the packed struct and then silently DROPPED from the
    // output by the final internal-column cleanup
    val left = Seq((1L, 100L, "x")).toDF("k", "ts", "_t")
    val right = Seq((1L, 90L, 5.0)).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      JoinOps.asofJoin(left, right, "k", "k", "ts", "ts", Seq("v"), tieBreak = "v")
    }
    assert(e.getMessage.contains("_t"))
  }

  test("intervalJoin: overlap pairs exactly once, even when spanning many buckets") {
    import spark.implicits._
    val left = Seq(
      (1L, 0L, 50L),    // overlaps r10, r11
      (2L, 100L, 200L), // overlaps r12 (long interval, many shared buckets)
      (3L, 300L, 310L)  // no overlap
    ).toDF("lid", "ls", "le")
    val right = Seq(
      (10L, 40L, 60L),   // touches 1 at the boundary (inclusive)
      (11L, 50L, 55L),   // touches 1 exactly at le
      (12L, 90L, 250L),  // fully covers 2
      (13L, 260L, 290L)  // gap before 3
    ).toDF("rid", "rs", "re")
    val pairs = JoinOps.intervalJoin(left, right, "ls", "le", "rs", "re",
        bucket = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    // exactly once per overlapping pair — no duplicates from shared buckets
    assert(pairs == Seq((1L, 10L), (1L, 11L), (2L, 12L)))
  }

  test("rangeJoin without keys and duplicate-free across bucket overlap") {
    val pts = Seq(("p1", 105L), ("p2", 500L)).toDF("pid", "t")
    val ivs = Seq(("i1", 90L, 210L)).toDF("iid", "s", "e")
    val rows = JoinOps.rangeJoin(pts, ivs, "t", "s", "e", bucket = 10L)
      .select("pid", "iid").as[(String, String)].collect()
    // the interval explodes over 13 buckets, but (p1, i1) appears ONCE —
    // a pair meets only in the point's bucket
    assert(rows.toSeq == Seq(("p1", "i1")))
  }

  test("rangeJoin agrees with the naive BETWEEN join on real events") {
    val ev = graft.Tables(spark, sf, "events")
    val pts = ev.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("t"))
    val ivs = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("iid"), col("user_id").as("ik"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + 7200000000L).as("e"))
    val fast = JoinOps.rangeJoin(pts, ivs, "t", "s", "e",
        bucket = 3600000000L, leftKey = Some("user_id"), rightKey = Some("ik"))
      .select("event_id", "iid")
    val naive = pts.join(ivs, col("user_id") === col("ik") &&
        col("t").between(col("s"), col("e")))
      .select("event_id", "iid")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() > 0)
    // and the plan is an equi-join, not a nested loop
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("rangeJoin fails loud on an interval wider than maxBuckets") {
    val pts = Seq(("p1", 5L)).toDF("pid", "t")
    val ivs = Seq(("i1", 0L, 1000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      JoinOps.rangeJoin(pts, ivs, "t", "s", "e", bucket = 1L, maxBuckets = 4)
        .collect()
    }
    assert(ex.getMessage.contains("rangeJoin") ||
      ex.getCause != null && ex.getCause.getMessage.contains("rangeJoin"))
  }

  test("asofJoin plans a single exchange (no join amplification)") {
    val plan = JoinOps.asofJoin(left, right, "k", "rk", "ts", "rts",
        payloadCols = Seq("oid", "price"), tieBreak = "oid")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one exchange for the right-side (key, ts) pre-aggregate feeding the
    // union, one for the merge window partition — never a per-pair join
    assert(exchanges <= 2, s"expected ≤2 exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
