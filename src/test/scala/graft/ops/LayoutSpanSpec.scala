package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Round-5 operators — duplicated-span detection, Z-order layout keys,
  * sliding-window rates — pinned on synthetic fixtures with hand-computed
  * answers (the oracle gate covers the parquet corpus).
  */
class LayoutSpanSpec extends SparkSpec {
  import spark.implicits._

  test("duplicatedSpans: cross-document k-token repeats surface; singletons don't") {
    val docs = Seq(
      (1L, "a b c d e f g h i"),        // spans: a..h, b..i
      (2L, "x a b c d e f g h y"),      // shares a..h
      (3L, "totally different words in this unrelated document here")
    ).toDF("doc_id", "text")
    val out = DedupOps.duplicatedSpans(docs, k = 8)
      .as[(String, Long, Long)].collect().map { case (s, d, o) => s -> ((d, o)) }.toMap
    assert(out == Map("a b c d e f g h" -> (2L, 2L)))
  }

  test("duplicatedSpans: within-doc repeats count occurrences but not documents") {
    val rep = ("p q r s t u v w " * 2).trim   // span p..w occurs at offsets 0 and 8
    val docs = Seq((1L, rep), (2L, "p q r s t u v w tail")).toDF("doc_id", "text")
    val out = DedupOps.duplicatedSpans(docs, k = 8)
      .filter(col("span") === "p q r s t u v w")
      .as[(String, Long, Long)].collect().head
    assert(out._2 == 2L)        // two distinct docs
    assert(out._3 == 3L)        // three occurrences (2 in doc 1, 1 in doc 2)
    // a span repeated only inside ONE doc is not a cross-doc dup
    val solo = Seq((1L, rep)).toDF("doc_id", "text")
    assert(DedupOps.duplicatedSpans(solo, k = 8).count() == 0)
  }

  test("zorderLayout: Morton interleave is bit-exact and clamped") {
    // x=3 (bits 0,1) -> z bits 0,2 = 5; y=1 (bit 0) -> z bit 1 = 2; z=7
    val docs = Seq(
      (1L, 3L, "one"),                          // zx=3, zy=1 -> zvalue=7
      (2L, 2L, "a b"),                          // zx=2 (bit1->z bit2=4), zy=2 (bit1->z bit3=8) -> 12
      (3L, 999999L, "t")                        // chars clamp to 65535
    ).toDF("doc_id", "n_chars", "text")
    val out = CorpusOps.zorderLayout(docs)
      .select(col("doc_id"), col("zx"), col("zy"), col("zvalue"), col("zbucket"))
      .as[(Long, Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 1L, 7L, 0)))
    assert(out(2L) == ((2L, 2L, 2L, 12L, 0)))
    assert(out(3L)._2 == 65535L)
    // all-ones x and y -> all 32 bits set -> top bucket
    val full = Seq((9L, 65535L, Seq.fill(70000)("w").mkString(" ")))
      .toDF("doc_id", "n_chars", "text")
    val fz = CorpusOps.zorderLayout(full).select(col("zvalue"), col("zbucket"))
      .as[(Long, Int)].collect().head
    assert(fz._1 == (1L << 32) - 1 && fz._2 == 15)
  }

  test("exportZOrdered: written files carry disjoint zvalue ranges (pruning-ready)") {
    val docs = graft.Tables(spark, sf, "documents")
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    CorpusOps.exportZOrdered(docs, out, nFiles = 4)
    // per-file min/max of the layout key must not overlap — that is the
    // property parquet stats pruning exploits
    val perFile = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("zvalue"))
      .groupBy(col("f"))
      .agg(min(col("zvalue")).as("lo"), max(col("zvalue")).as("hi"))
      .orderBy(col("lo"))
      .as[(String, Long, Long)].collect()
    assert(perFile.length >= 2 && perFile.length <= 4)
    perFile.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: hi=$hi1 lo=$lo2")
      case _ => ()
    }
    // lossless
    assert(spark.read.parquet(out).count() == docs.count())
  }

  test("zorderLayout: key ranges are rectangles (locality beats lexicographic sort)") {
    // Morton property: two points close in BOTH dims are close in z; a
    // point far in y is far in z even when x matches exactly.
    val docs = Seq(
      (1L, 10L, "a b c"), (2L, 11L, "a b c"),   // neighbors in x, same y
      (3L, 10L, Seq.fill(5000)("w").mkString(" "))  // same x, y far away
    ).toDF("doc_id", "n_chars", "text")
    val z = CorpusOps.zorderLayout(docs).select(col("doc_id"), col("zvalue"))
      .as[(Long, Long)].collect().toMap
    assert(math.abs(z(1L) - z(2L)) < math.abs(z(1L) - z(3L)))
  }

  test("removeDuplicatedSpans: later occurrences cut, canonical kept, overlaps union") {
    val run = "a b c d e f g h"
    val docs = Seq(
      (1L, s"x $run y"),          // canonical occurrence (lowest doc id)
      (2L, s"z $run w"),          // duplicate -> cut
      (3L, ("p q r s t u v w " * 2).trim) // within-doc repeat -> second cut
    ).toDF("doc_id", "text")
    val out = DedupOps.removeDuplicatedSpans(docs, k = 8)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 == s"x $run y" && out(1L)._3 == 0L)
    assert(out(2L)._4 == "z w" && out(2L)._3 == 8L)
    assert(out(3L)._4 == "p q r s t u v w" && out(3L)._3 == 8L)
    assert(out(3L)._2 == 16L)
  }

  test("removeDuplicatedSpans: clean corpus passes through untouched") {
    val docs = Seq(
      (1L, "all words here are entirely unique first document"),
      (2L, "completely different tokens in this second one")
    ).toDF("doc_id", "text")
    val out = DedupOps.removeDuplicatedSpans(docs, k = 4)
      .as[(Long, Long, Long, String)].collect()
    assert(out.forall(_._3 == 0L))
    assert(out.map(_._4).toSet ==
      Set("all words here are entirely unique first document",
        "completely different tokens in this second one"))
  }

  test("charStats: entropy, digit and uppercase fractions are hand-checkable") {
    val docs = Seq(
      (1L, "aabb"),          // two symbols, p=1/2 each -> ln 2
      (2L, "0123456789"),    // ten symbols -> ln 10, all digits
      (3L, "AAaa"),          // half uppercase
      (4L, "zzzz")           // single symbol -> zero entropy
    ).toDF("doc_id", "text")
    val out = TextOps.charStats(docs)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._3 == math.rint(math.log(2) * 1e6) / 1e6)
    assert(out(2L)._3 == math.rint(math.log(10) * 1e6) / 1e6)
    assert(out(2L)._4 == 1.0 && out(2L)._5 == 0.0)
    assert(out(3L)._5 == 0.5)
    assert(out(4L)._3 == 0.0)
    assert(out(1L)._2 == 4L)
  }

  test("degreeHistogram: neighbor counts per doc, clean majority reported as degree 0") {
    val docs = (1L to 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // 1-2, 1-3, 2-3 triangle; 4-5 pair; 6 untouched
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val hist = GraphOps.degreeHistogram(docs, pairs)
      .as[(Long, Long)].collect().toMap
    assert(hist == Map(2L -> 3L, 1L -> 2L, 0L -> 1L))
    // no untouched docs -> no degree-0 row at all
    val all = GraphOps.degreeHistogram(docs.filter(col("doc_id") <= 5), pairs)
      .as[(Long, Long)].collect().toMap
    assert(all == Map(2L -> 3L, 1L -> 2L))
  }

  test("slidingRates: each event lands in exactly window/slide overlapping windows") {
    def ts(min: Int, sec: Int = 0) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")
    val events = Seq(
      (1L, ts(7), "view", 1.0),      // windows starting 00:00 and 00:05
      (2L, ts(8), "view", 2.0),      // same two windows
      (3L, ts(12), "click", 4.0),    // windows 00:05 and 00:10
      (4L, ts(10), "view", 8.0)      // boundary: windows 00:05 and 00:10
    ).toDF("event_id", "ts", "event_type", "value")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    def winUs(min: Int) = base + min * 60000000L
    val out = SessionOps.slidingRates(events)
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out((winUs(0), "view")) == ((2L, 3.0)))   // events 1,2
    assert(out((winUs(5), "view")) == ((3L, 11.0)))  // events 1,2,4
    assert(out((winUs(10), "view")) == ((1L, 8.0)))  // event 4
    assert(out((winUs(5), "click")) == ((1L, 4.0)))
    assert(out((winUs(10), "click")) == ((1L, 4.0)))
    assert(out.size == 5)
  }
}
