package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style tests for the A4/A1 bucket-prefix-sum rank: the
  * distributed form must equal the window form ROW FOR ROW on
  * randomized changelogs engineered to stress the bucketing — heavy
  * timestamp ties (far fewer distinct keys than buckets), a
  * zero-width key span (every row in one bucket), negative keys, and
  * degenerate nBuckets. Seeded generation, no scalacheck bridge
  * (same convention as AsofPropertySpec).
  */
class CdcRankPropertySpec extends SparkSpec {
  import spark.implicits._

  // (schema, table, action, pk, event_unixtime, action_seq, rid)
  // rid is a unique row id used as the final order key so the reference
  // total order is unambiguous (rank equality is only well-defined for
  // a total order; real callers pass their own unique tiebreaker).
  private def gen(rnd: Random, n: Int, tsSpan: Int, tsBase: Long) =
    (0 until n).map { i =>
      val action = rnd.nextInt(3) match {
        case 0 => "insert"; case 1 => "delete"; case _ => "query"
      }
      val seq = action match {
        case "query" => 0; case "delete" => 1; case _ => 2
      }
      ("db", s"t${rnd.nextInt(3)}", action, rnd.nextInt(10).toLong,
        tsBase + (if (tsSpan == 0) 0L else rnd.nextInt(tsSpan).toLong),
        seq, i.toLong)
    }.toDF("schema", "table", "action", "pk", "event_unixtime",
      "action_seq", "rid")

  test("applyOrderDistributed == applyOrder on adversarial tie/span shapes (seeded)") {
    val shapes = Seq(
      (11L, 120, 4, 0L),            // 4 distinct ts over 120 rows: massive ties
      (12L, 80, 0, 1000L),          // zero span: every row in ONE bucket
      (13L, 100, 1000000, -500000L),// wide span, negative keys
      (14L, 60, 7, Long.MinValue / 2) // extreme base magnitude
    )
    for ((seed, n, span, base) <- shapes; nBuckets <- Seq(1, 3, 256)) {
      val df = gen(new Random(seed), n, span, base)
      val win = CdcOps.applyOrder(df, orderCols = Seq("event_unixtime", "rid"))
      val dist = CdcOps.applyOrderDistributed(df,
        orderCols = Seq("event_unixtime", "rid"), nBuckets = nBuckets)
      assert(win.exceptAll(dist).isEmpty && dist.exceptAll(win).isEmpty,
        s"mismatch at seed=$seed span=$span base=$base nBuckets=$nBuckets")
    }
  }

  test("microBatchId == window-derived batch ids on the same shapes (seeded)") {
    for ((seed, n, span) <- Seq((21L, 120, 4), (22L, 80, 0), (23L, 100, 50000))) {
      val df = gen(new Random(seed), n, span, 100L)
      val mb = CdcOps.microBatchId(df, insertNum = 7,
        orderCols = Seq("event_unixtime", "rid"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("schema"), col("table"))
        .orderBy(col("event_unixtime"), col("rid"))
      val ref = df.withColumn("batch_id", graft.functions.IntMath.floorDiv(
        (row_number().over(w) - 1).cast("long"), 7L))
      assert(ref.exceptAll(mb).isEmpty && mb.exceptAll(ref).isEmpty,
        s"mismatch at seed=$seed span=$span")
      val sizes = mb.groupBy("schema", "table", "batch_id").count()
        .select("count").as[Long].collect()
      assert(sizes.forall(_ <= 7))
    }
  }
}
