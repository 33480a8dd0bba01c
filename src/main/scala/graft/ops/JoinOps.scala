package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no built-in operator for, composed from
  * built-ins so Catalyst keeps full visibility (pushdown, AQE, codegen).
  *
  * The as-of join here uses the union-merge formulation instead of the
  * naive `left ⋈ right ON key AND l.ts >= r.ts` + row_number plan: the
  * naive form materializes every (left row × earlier right row) match —
  * O(n·m) per key — before discarding all but one. Union-merge tags the
  * two inputs, unions them, and takes `last(right_payload, ignoreNulls)`
  * over a per-key time-ordered running window: exactly ONE hash exchange
  * of n+m rows and one sort, no row amplification, whole-stage codegen
  * throughout. That is the plan that survives 100 TB — the amplification
  * of the naive form is unbounded (a key with k right rows amplifies every
  * left probe k-fold), while union-merge stays linear in input size
  * regardless of key skew.
  */
object JoinOps {

  /** As-of join, backward (default), forward, or nearest.
    *
    * Backward: for each left row, attaches `payloadCols` from the right
    * row with the largest `rightTs <= leftTs` and equal join key.
    * Forward (`direction = "forward"`): the smallest `rightTs >= leftTs`
    * — the same union-merge plan scanning time descending instead of
    * ascending. Nearest (`direction = "nearest"`): whichever of the two
    * is closer by absolute gap, preferring backward on an exact tie
    * (pandas merge_asof's direction knob, all three values) — still one
    * exchange; the partition is sorted twice, once per scan direction.
    * Ties among right rows on (key, ts) are broken deterministically by
    * the largest `tieBreak` column. Left rows with no matching right row
    * are kept with null payload when `keepUnmatched`, dropped otherwise
    * (inner as-of). Timestamp gaps compare as exact epoch microseconds;
    * numeric timestamps compare natively.
    *
    * `tolerance` (same units as the gap: µs for timestamps, native for
    * numerics) bounds the match distance — pandas merge_asof's knob: a
    * candidate farther than the bound is no match at all. For `nearest`
    * the bound applies per direction BEFORE choosing, so a too-far
    * backward row never shadows an in-range forward row. The bound is a
    * post-window null-out — plan shape (one exchange, no amplification)
    * is unchanged.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payloadCols: Seq[String], tieBreak: String,
               keepUnmatched: Boolean = false,
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    require(payloadCols.intersect(left.columns.toSeq).isEmpty,
      s"payload columns ${payloadCols.mkString(",")} must not collide with left columns")
    // the final drop removes ALL of these names — a same-named left data
    // column would be restored from _l and then silently deleted
    val reserved = Set("_k", "_t", "_tag", "_r", "_l", "_m", "_m0", "_mb", "_mf", "_rt")
    require(left.columns.forall(!reserved(_)),
      s"left columns ${left.columns.filter(reserved).mkString(",")} collide " +
        s"with asofJoin's internal names (${reserved.mkString(",")}) — rename them first")
    require(!payloadCols.exists(reserved) && !reserved(tieBreak),
      s"payload/tieBreak columns must not use the internal names ${reserved.mkString(",")}")
    // The payload struct leads with the tie-break column, so struct
    // ordering IS the (key, ts) tie-break order: the merge window sorts
    // right rows by _r within equal (ts, tag) and `last` picks the
    // struct-max — the same winner the old per-(key, ts) max(struct)
    // pre-aggregation produced, without its extra exchange + two sorts
    // of the whole right side (r16, guide §2: that aggregate planned as
    // Sort→SortAggregate→Exchange→Sort→SortAggregate because struct max
    // is not hash-aggregable). The struct carries the right timestamp in
    // trailing field _rt for nearest's gap arithmetic.
    val payload = struct((tieBreak +: payloadCols.filterNot(_ == tieBreak))
      .map(col) :+ col(rightTs).as("_rt"): _*)
    val lStructCols = left.columns.toSeq
    val lType = left.select(struct(lStructCols.map(col): _*).as("_l"))
      .schema("_l").dataType

    val rTagged = right.select(col(rightKey).as("_k"),
      col(rightTs).as("_t"), lit(0).as("_tag"), payload.as("_r"),
      lit(null).cast(lType).as("_l"))
    val rType = rTagged.schema("_r").dataType
    val lTagged = left.select(col(leftKey).as("_k"), col(leftTs).as("_t"),
      lit(1).as("_tag"), lit(null).cast(rType).as("_r"),
      struct(lStructCols.map(col): _*).as("_l"))

    // right rows sort before left rows at equal ts (_tag 0 < 1): the
    // as-of is INCLUSIVE of a right row at exactly leftTs. Backward
    // scans time ascending (last right seen = most recent ≤ leftTs);
    // forward scans descending (last right seen = nearest ≥ leftTs).
    // Left rows tying on (key, ts) are interchangeable for the window
    // (their _r is null and ignored), so the result is deterministic
    // despite the tie.
    val union = rTagged.unionByName(lTagged)
    // exact gap arithmetic: epoch micros for timestamps, native otherwise
    def gapNum(c: Column): Column = left.schema(leftTs).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(c.cast("timestamp_ltz"))
      case org.apache.spark.sql.types.DateType => unix_date(c.cast("date")).cast("long")
      case _ => c
    }
    def windowed(order: Column): Column = {
      // _r last in the sort: within equal (ts, tag) the right rows order
      // by the payload struct (tie-break leading), so `last` = struct-max
      // — deterministic without the pre-aggregation. Left rows are all
      // null _r within their (ts, tag=1) group; their relative order is
      // irrelevant to the window.
      val w = Window.partitionBy(col("_k"))
        .orderBy(order, col("_tag"), col("_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("_r"), ignoreNulls = true).over(w)
    }
    // tolerance: null out a windowed match farther than the bound (per
    // direction, before nearest chooses between its two candidates)
    def bounded(m: Column, gap: Column): Column = tolerance match {
      case None => m
      case Some(tol) => when(m.isNotNull && gap <= lit(tol), m)
    }
    def backGap(m: Column) = gapNum(col("_t")) - gapNum(m.getField("_rt"))
    def fwdGap(m: Column) = gapNum(m.getField("_rt")) - gapNum(col("_t"))
    val merged = (direction match {
      case "backward" =>
        union.withColumn("_m0", windowed(col("_t").asc))
          .withColumn("_m", bounded(col("_m0"), backGap(col("_m0"))))
          .drop("_m0")
      case "forward" =>
        union.withColumn("_m0", windowed(col("_t").desc))
          .withColumn("_m", bounded(col("_m0"), fwdGap(col("_m0"))))
          .drop("_m0")
      case _ =>
        union
          .withColumn("_mb", windowed(col("_t").asc))
          .withColumn("_mf", windowed(col("_t").desc))
          .withColumn("_mb", bounded(col("_mb"), backGap(col("_mb"))))
          .withColumn("_mf", bounded(col("_mf"), fwdGap(col("_mf"))))
          .withColumn("_m",
            when(col("_mb").isNull, col("_mf"))
              .when(col("_mf").isNull, col("_mb"))
              .when(fwdGap(col("_mf")) < backGap(col("_mb")), col("_mf"))
              .otherwise(col("_mb"))) // exact tie → backward
          .drop("_mb", "_mf")
    }).filter(col("_tag") === 1)

    val widened = lStructCols.foldLeft(merged) { (df, c) =>
        df.withColumn(c, col("_l").getField(c))
      }
      .withColumns(payloadCols.map(c => c -> col("_m").getField(c)).toMap)
    // inner as-of drops rows with no matched right ROW — the struct's
    // nullness, not a payload field's (a matched row may carry null values
    // in any payload column)
    val out = if (keepUnmatched) widened else widened.filter(col("_m").isNotNull)
    out.drop("_k", "_t", "_tag", "_r", "_l", "_m")
  }

  /** Interval-interval overlap join: pair left `[lStart, lEnd]` with
    * every right `[rStart, rEnd]` that overlaps it (`lStart ≤ rEnd AND
    * rStart ≤ lEnd`), under an optional equality key — the
    * schedule/conflict/coverage join (two interval sets, not
    * point-probe).
    *
    * Same bucket-blocking idea as [[rangeJoin]], plus the responsibility
    * trick that kills the dedup pass: both sides explode to the time
    * buckets they cover, but a candidate pair is emitted ONLY in bucket
    * `max(bucket(lStart), bucket(rStart))` — the first bucket both
    * intervals inhabit (overlap guarantees each covers it). Every
    * overlapping pair meets in exactly one bucket, so the equi-join
    * output needs no `distinct`. Expansion per interval is bounded by
    * `maxBuckets` exactly as in [[rangeJoin]].
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   lStart: String, lEnd: String,
                   rStart: String, rEnd: String,
                   bucket: Long, leftKey: Option[String] = None,
                   rightKey: Option[String] = None,
                   maxBuckets: Int = 1024): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    require(Set(lStart, lEnd, rStart, rEnd).size == 4,
      "interval column names must be distinct across sides")
    def floorDiv(c: Column): Column = graft.functions.IntMath.floorDiv(c, bucket)
    def explodeSide(df: DataFrame, s: String, e: String, bCol: String): DataFrame =
      df.withColumn("_bs", floorDiv(col(s)))
        .withColumn("_be", floorDiv(col(e)))
        .filter(col("_be") >= col("_bs"))
        .withColumn("_nb", (col("_be") - col("_bs") + 1).cast("int"))
        .withColumn(bCol, explode(when(col("_nb") <= maxBuckets,
          sequence(col("_bs"), col("_be"))).otherwise(
          raise_error(concat(
            lit(s"intervalJoin: interval spans > $maxBuckets buckets; "),
            lit(s"increase bucket width (current $bucket)"))))))
        .drop("_bs", "_be", "_nb")
    val lb = explodeSide(left, lStart, lEnd, "_lb")
    val rb = explodeSide(right, rStart, rEnd, "_rb")
    // side-qualified key refs: the natural same-named key on both sides
    // (user_id = user_id) is otherwise an AMBIGUOUS_REFERENCE error
    val keyCond = (leftKey, rightKey) match {
      case (Some(lk), Some(rk)) => lb(lk) === rb(rk)
      case (None, None) => lit(true)
      case _ => throw new IllegalArgumentException("both or neither join key")
    }
    lb.join(rb, col("_lb") === col("_rb") && keyCond &&
        col(lStart).cast("long") <= col(rEnd).cast("long") &&
        col(rStart).cast("long") <= col(lEnd).cast("long") &&
        // responsibility bucket: emit each pair exactly once
        col("_lb") === greatest(floorDiv(col(lStart)), floorDiv(col(rStart))))
      .drop("_lb", "_rb")
  }

  /** Point-in-interval range join: pair each left row (a point `leftTs`)
    * with every right row whose `[startTs, endTs]` interval contains it,
    * under an optional equality key.
    *
    * Catalyst plans a raw `l.k = r.k AND ts BETWEEN s AND e` as a hash
    * join on the key with the range as a residual — fine with a selective
    * key, but a low-cardinality/absent key degenerates to
    * BroadcastNestedLoopJoin. This operator buckets time instead: points
    * land in bucket `ts div B`, intervals explode to the buckets they
    * overlap, and the join is a plain equi-join on (key, bucket) with the
    * exact BETWEEN as a residual filter. Interval expansion is bounded by
    * `maxBuckets` (len/B + 1 per interval) — choose B near the typical
    * interval length so the blow-up factor stays ~2. Each (point,
    * interval) pair meets in exactly one bucket (the point's), so no
    * dedup pass is needed.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftTs: String, startTs: String, endTs: String,
                bucket: Long, leftKey: Option[String] = None,
                rightKey: Option[String] = None,
                maxBuckets: Int = 1024): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    require(Set(leftTs, startTs, endTs).size == 3,
      "leftTs/startTs/endTs column names must be distinct")
    def floorDiv(c: Column): Column = graft.functions.IntMath.floorDiv(c, bucket)
    val lb = left.withColumn("_b", floorDiv(col(leftTs)))
    val rb = right
      .withColumn("_bs", floorDiv(col(startTs)))
      .withColumn("_be", floorDiv(col(endTs)))
      .filter(col("_be") >= col("_bs")) // empty/backward intervals match nothing
      .withColumn("_nb", (col("_be") - col("_bs") + 1).cast("int"))
      .withColumn("_b", explode(when(col("_nb") <= maxBuckets,
        sequence(col("_bs"), col("_be"))).otherwise(
        // pathological mega-interval: fail loud instead of exploding the
        // cluster — callers pick a coarser bucket for such data
        raise_error(concat(lit(s"rangeJoin: interval spans > $maxBuckets buckets; "),
          lit(s"increase bucket width (current $bucket)"))))))
      .drop("_bs", "_be", "_nb")
    // side-qualified key refs: same-named keys must not be ambiguous
    val keyCond = (leftKey, rightKey) match {
      case (Some(lk), Some(rk)) => lb(lk) === rb(rk)
      case (None, None) => lit(true)
      case _ => throw new IllegalArgumentException("both or neither join key")
    }
    lb.join(rb, lb("_b") === rb("_b") && keyCond &&
        col(leftTs).cast("long").between(col(startTs).cast("long"),
          col(endTs).cast("long")))
      .drop("_b")
  }
}
