package graft.ops

import graft.SparkSpec
import scala.util.Random

/** Property-style tests for the as-of join: every direction must agree
  * with a brute-force in-memory reference on randomized keyed event
  * streams — duplicates, exact-tie timestamps, unmatched keys and all.
  * Seeded generation keeps runs deterministic without a
  * scalatest-scalacheck bridge (not in the offline cache).
  */
class AsofPropertySpec extends SparkSpec {
  import spark.implicits._

  private def gen(rnd: Random): (Seq[(String, Long, Long)], Seq[(Long, Long, Long)]) = {
    val left = (0 until 25).map(i =>
      (s"e$i", rnd.nextInt(4).toLong, rnd.nextInt(50).toLong))
    val right = (0 until 20).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(50).toLong, i.toLong))
    (left, right)
  }

  /** Reference pick: the (ts, oid) a direction should match, if any. */
  private def expect(direction: String, k: Long, ts: Long,
                     right: Seq[(Long, Long, Long)]): Option[Long] = {
    val mine = right.filter(_._1 == k)
    def best(rows: Seq[(Long, Long, Long)], pickTs: Seq[Long] => Long): Option[Long] =
      if (rows.isEmpty) None
      else {
        val t = pickTs(rows.map(_._2))
        Some(rows.filter(_._2 == t).map(_._3).max) // tieBreak: max oid
      }
    val back = best(mine.filter(_._2 <= ts), _.max)
    val fwd = best(mine.filter(_._2 >= ts), _.min)
    direction match {
      case "backward" => back
      case "forward" => fwd
      case _ =>
        (back, fwd) match {
          case (None, f) => f
          case (b, None) => b
          case (Some(b), Some(f)) =>
            val bt = mine.filter(r => r._2 <= ts && r._3 == b).head._2
            val ft = mine.filter(r => r._2 >= ts && r._3 == f).head._2
            if (ft - ts < ts - bt) Some(f) else Some(b)
        }
    }
  }

  test("asofJoin agrees with the in-memory reference in all 3 directions (8 seeds)") {
    for (seed <- 1 to 8; direction <- Seq("backward", "forward", "nearest")) {
      val rnd = new Random(seed)
      val (left, right) = gen(rnd)
      val got = JoinOps.asofJoin(
          left.toDF("ev", "k", "ts"), right.toDF("rk", "rts", "oid"),
          "k", "rk", "ts", "rts", payloadCols = Seq("oid"), tieBreak = "oid",
          keepUnmatched = true, direction = direction)
        .select("ev", "oid").collect()
        .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      left.foreach { case (ev, k, ts) =>
        val want = expect(direction, k, ts, right)
        assert(got(ev) == want,
          s"seed=$seed direction=$direction ev=$ev k=$k ts=$ts: got ${got(ev)}, want $want")
      }
    }
  }

  test("tolerance bounds each direction before nearest chooses (8 seeds)") {
    // in-bound reference: drop each side's candidates farther than tol
    // FIRST (for backward/forward this equals bounding the winner — the
    // winner is that side's closest; for nearest it is the semantics that
    // keeps an in-range forward row from being shadowed by a too-far
    // backward one)
    val tol = 7L
    def boundedRight(right: Seq[(Long, Long, Long)], ts: Long, back: Boolean) =
      right.filter(r => if (back) ts - r._2 <= tol else r._2 - ts <= tol)
    for (seed <- 1 to 8; direction <- Seq("backward", "forward", "nearest")) {
      val rnd = new Random(seed + 100)
      val (left, right) = gen(rnd)
      val got = JoinOps.asofJoin(
          left.toDF("ev", "k", "ts"), right.toDF("rk", "rts", "oid"),
          "k", "rk", "ts", "rts", payloadCols = Seq("oid"), tieBreak = "oid",
          keepUnmatched = true, direction = direction, tolerance = Some(tol))
        .select("ev", "oid").collect()
        .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      left.foreach { case (ev, k, ts) =>
        val rb = boundedRight(right, ts, back = true)
        val rf = boundedRight(right, ts, back = false)
        val want = direction match {
          case "backward" => expect("backward", k, ts, rb)
          case "forward" => expect("forward", k, ts, rf)
          case _ =>
            (expect("backward", k, ts, rb), expect("forward", k, ts, rf)) match {
              case (None, f) => f
              case (b, None) => b
              case (b @ Some(_), f @ Some(_)) =>
                // both in range: fall back to the unbounded nearest rule
                // restricted to in-range rows on each side
                val both = rb.filter(r => r._1 == k && r._2 <= ts) ++
                  rf.filter(r => r._1 == k && r._2 >= ts)
                expect("nearest", k, ts, both)
            }
        }
        assert(got(ev) == want,
          s"seed=$seed direction=$direction ev=$ev k=$k ts=$ts: got ${got(ev)}, want $want")
      }
    }
  }
}
