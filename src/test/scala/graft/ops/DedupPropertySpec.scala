package graft.ops

import graft.SparkSpec
import scala.util.Random

/** Property-style tests for the keyed dedup operator (A2): last-write-wins
  * must be idempotent and invariant under input permutation — the
  * distributed guarantee the reference gets for free from its
  * single-threaded buffer dict (synch/writer/merge_tree.py:80-84).
  * Seeded generation keeps the runs deterministic without a
  * scalatest-scalacheck bridge (not in the offline cache).
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def genBatch(rnd: Random): Seq[(Long, String, Long, Long)] =
    (0 until 30).map { i =>
      (rnd.nextInt(6).toLong,
        if (rnd.nextBoolean()) "insert" else "delete",
        rnd.nextInt(1000).toLong,
        i.toLong) // unique offset tie-breaker
    }

  private def run(rows: Seq[(Long, String, Long, Long)]): Set[(Long, String, Long, Long)] =
    CdcOps.dedupByPk(
      rows.toDF("pk", "action", "event_unixtime", "offset"),
      pkCols = Seq("pk"),
      orderCols = Seq("event_unixtime", "offset"),
      extraPartition = Seq("action"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def runSalted(rows: Seq[(Long, String, Long, Long)]): Set[(Long, String, Long, Long)] =
    CdcOps.dedupByPkSalted(
      rows.toDF("pk", "action", "event_unixtime", "offset"),
      pkCols = Seq("pk"),
      orderCols = Seq("event_unixtime", "offset"),
      extraPartition = Seq("action"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("dedupByPk is permutation-invariant and idempotent (20 seeded cases)") {
    (1 to 20).foreach { seed =>
      val rnd = new Random(seed)
      val batch = genBatch(rnd)
      val once = run(batch)
      assert(once == run(rnd.shuffle(batch)), s"permutation variance at seed $seed")
      assert(once == run(once.toSeq), s"not idempotent at seed $seed")
      // reference semantics: exactly one survivor per (action, pk) present
      val keys = batch.map(b => (b._2, b._1)).toSet
      assert(once.map(o => (o._2, o._1)) == keys, s"key coverage at seed $seed")
    }
  }

  test("salted two-phase dedup equals the single-window form (10 seeded cases)") {
    (1 to 10).foreach { seed =>
      val batch = genBatch(new Random(seed))
      assert(runSalted(batch) == run(batch), s"salted divergence at seed $seed")
    }
  }
}
