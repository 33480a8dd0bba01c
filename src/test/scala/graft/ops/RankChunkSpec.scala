package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 additions: token-window chunking, BM25 search, count-min
  * heavy hitters, fixed-point PageRank, touch attribution. */
class RankChunkSpec extends SparkSpec {
  import spark.implicits._

  // ---- chunkTokens ----

  test("chunkTokens: stride grid, tail chunk, overlap, empty doc") {
    val docs = Seq(
      (1L, (1 to 70).map(i => s"w$i").mkString(" ")), // 3 starts: 0,30,60
      (2L, (1 to 30).map(i => s"w$i").mkString(" ")), // exactly one stride
      (3L, "a b c"),                                  // shorter than window
      (4L, "")                                        // empty -> no chunks
    ).toDF("doc_id", "text")
    val out = TextOps.chunkTokens(docs, window = 40, stride = 30)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Int, Long, String)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq === Seq(
      (1L, 0, 40L), (1L, 1, 40L), (1L, 2, 10L),
      (2L, 0, 30L), (3L, 0, 3L)))
    // overlap: chunk 1 of doc 1 starts at token 31
    assert(out(1)._4.startsWith("w31 "))
    // tail chunk carries the last tokens
    assert(out(2)._4.endsWith(" w70"))
    assert(!out.exists(_._1 == 4L))
  }

  test("chunkTokens: every token position is covered when stride <= window") {
    val docs = Seq((1L, (1 to 95).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val covered = TextOps.chunkTokens(docs, window = 40, stride = 30)
      .select(explode(split(col("chunk_text"), " ")).as("tok"))
      .distinct().count()
    assert(covered === 95L)
  }

  // ---- bm25 ----

  test("bm25: tf/df arithmetic matches a naive recompute") {
    val docs = Seq(
      (1L, "spark spark spark scan"),
      (2L, "spark scan scan merge merge merge"),
      (3L, "merge merge"),
      (4L, "window window window window")
    ).toDF("doc_id", "text")
    val out = TextOps.bm25(docs, terms = Seq("spark", "merge"))
      .orderBy("doc_id")
      .select("doc_id", "n_hits", "bm25").as[(Long, Long, Double)].collect()
    // doc 4 matches nothing
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_._2).toSeq === Seq(1L, 2L, 1L))
    // naive recompute (same formula, same order) for doc 1 / term spark:
    // N=4, df=2, tf=3, dl=4, avgdl=16/4=4
    val idf = math.log(1.0 + ((4.0 - 2.0) + 0.5) / (2.0 + 0.5))
    val expected = ((idf * 3.0) * 2.2) /
      (3.0 + 1.2 * (0.25 + (0.75 * 4.0) / 4.0))
    assert(math.abs(out(0)._3 - math.rint(expected * 1e6) / 1e6) < 1e-9)
    // more occurrences of the same term => higher score than fewer,
    // same doc length (docs 1 vs 2 on 'spark' alone aren't comparable;
    // check ordering within one term family instead)
    assert(out(1)._3 > 0 && out(2)._3 > 0)
  }

  // ---- heavyHitters ----

  test("heavyHitters: exact equality with the exact formulation") {
    // zipf-ish: key k appears 401-k times for k in 1..400
    val rows = (1 to 400).flatMap(k => Seq.fill(401 - k)(s"key$k")).toDF("tok")
    val exact = rows.groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 250).as[(String, Long)].collect().toSet
    // narrow sketch (width 32): heavy collisions -> many false candidates,
    // but the exact re-count must still produce the identical final set
    for (w <- Seq(1024, 32)) {
      val hh = SketchOps.heavyHitters(rows, "tok", threshold = 250L, width = w)
        .as[(String, Long)].collect().toSet
      assert(hh === exact, s"width=$w heavy-hitter set must be exact")
    }
  }

  test("heavyHitters: empty result when nothing crosses the threshold") {
    val rows = Seq("a", "b", "a").toDF("tok")
    assert(SketchOps.heavyHitters(rows, "tok", threshold = 10L).count() === 0L)
  }

  // ---- pageRank ----

  test("pageRank: exact fixed-point values on a star graph + singleton") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id1", "id2")
    val r1 = GraphOps.pageRank(docs, pairs, iters = 1)
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    // hub: 150000 + (85 * 3_000_000)//100; leaves: 150000 + (85*(10^6 div 3))//100
    assert(r1(1L) === 150000L + 85L * 3000000L / 100L)
    assert(r1(2L) === 150000L + 85L * (1000000L / 3L) / 100L)
    assert(r1(2L) === r1(3L) && r1(3L) === r1(4L))
    // untouched node keeps base-only rank
    assert(r1(5L) === 150000L)
    // more iterations keep the hub on top and every rank >= base
    val r5 = GraphOps.pageRank(docs, pairs, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r5(1L) > r5(2L) && r5.values.forall(_ >= 150000L))
  }

  test("pageRank: symmetric pair ranks are equal, iters validated") {
    val docs = Seq(1L, 2L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val r = GraphOps.pageRank(docs, pairs, iters = 3).as[(Long, Long)].collect().toMap
    assert(r(1L) === r(2L))
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(docs, pairs, iters = 0)
    }
  }

  // ---- attribution ----

  test("attribution: first/last touch credit, direct conversions") {
    def ev(id: Long, u: Long, tUs: Long, tpe: String, v: Double) =
      (id, u, tUs, tpe, v)
    val events = Seq(
      // user 1: view -> click -> purchase  (first=view, last=click)
      ev(1, 1, 1000000L, "view", 0.0),
      ev(2, 1, 2000000L, "click", 0.0),
      ev(3, 1, 3000000L, "purchase", 10.0),
      // user 2: purchase first (direct), then view -> purchase
      ev(4, 2, 1000000L, "purchase", 5.0),
      ev(5, 2, 2000000L, "view", 0.0),
      ev(6, 2, 3000000L, "purchase", 7.5),
      // user 3: no purchase -> contributes nothing
      ev(7, 3, 1000000L, "click", 0.0)
    ).toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = SessionOps.attribution(events)
      .orderBy("first_touch", "last_touch")
      .select("first_touch", "last_touch", "n_conversions", "revenue")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("purchase", "direct", 1L, 5.0),   // user 2's opening purchase
      ("purchase", "view", 1L, 7.5),     // user 2's second (first touch = purchase)
      ("view", "click", 1L, 10.0)))      // user 1
  }
}
