package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Rate-anomaly detection and session-path mining on synthetic event
  * streams with hand-computed answers.
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("rateAnomalies: integer z-test flags the spike window and nothing else") {
    // type "a": 9 windows of 10 events + 1 window of 30.
    // n=10, s=120, ss=1800; spike dev = 30*10-120 = 180, 180^2 = 32400
    // rhs = 4*(10*1800 - 120^2) = 14400 -> flagged; steady windows
    // dev^2 = 400 -> clean.
    val events = (for {
      w <- 0 until 10
      i <- 0 until (if (w == 7) 30 else 10)
    } yield ((w * 100 + i).toLong, ts(w, i), "a", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
    val out = SessionOps.rateAnomalies(events)
      .as[(Long, String, Long)].collect().toSeq
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    assert(out == Seq((base + 7L * 3600000000L, "a", 30L)))
  }

  test("rateAnomalies: a flat stream has zero variance and no flags") {
    val events = (for { w <- 0 until 6; i <- 0 until 5 }
      yield ((w * 10 + i).toLong, ts(w, i), "b", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
    assert(SessionOps.rateAnomalies(events).count() == 0)
  }

  test("topPaths: per-session type sequences ranked by frequency, gap splits sessions") {
    val events = Seq(
      // user 1, session 1: view > click ; session 2 (gap > 30 min): view
      (1L, 1L, ts(0, 0), "view"), (2L, 1L, ts(0, 5), "click"),
      (3L, 1L, ts(2, 0), "view"),
      // user 2, one session: view > click
      (4L, 2L, ts(0, 10), "view"), (5L, 2L, ts(0, 12), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = SessionOps.topPaths(events)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("view>click", 2L), ("view", 1L)))
  }
}
