package graft.ops

import graft.functions.CrossHash._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketches with deterministic, engine-portable math — the
  * cardinality/frequency summaries a 100 TB pipeline keeps instead of
  * exact state. Unlike Spark's built-in `approx_count_distinct` (whose
  * HLL++ hashing is engine-private), these build on the shared portable
  * hash, so the DuckDB oracle reproduces every register and the estimate
  * hash-matches bit-for-bit — approximation without unverifiability.
  */
object SketchOps {

  /** 2^b for b in [0, 32] as a literal (2^32 still fits a Long). */
  private val POW2_33: Array[Long] = Array.tabulate(33)(b => 1L << b)

  /** HyperLogLog distinct-count estimate per group (m = 64 registers).
    *
    * Classic HLL over the portable hash: register `h mod 64`, rank =
    * 1 + index of the lowest set bit of `h div 64` (capped at 32; the
    * deterministic ρ variant — both engines fold the same bits), per-
    * register max, estimate `α·m² / Σ 2^(−M_j)` with empty registers
    * contributing 2⁰. The register sum is a sum of at most 64 dyadic
    * rationals spanning 33 exponents — EXACTLY representable in a
    * double, so it is order-insensitive and bit-identical across
    * engines; the only rounding is the final division (gated at 6 dp).
    *
    * Scale shape: one keyed aggregate to (group, register) with map-side
    * max combine — state is ≤ 64 rows per group regardless of input
    * cardinality — then one tiny per-group fold, mergeable across
    * partitions/days by register-wise max.
    *
    * Cardinality ceiling: the portable hash lives mod P ≈ 2³⁰, so
    * `w = h div 64` has only ~24 usable bits and register ranks saturate
    * at ~24 — estimates plateau around ~10⁸ distincts (standard HLL
    * dynamic range is 2^(hash bits)). That is the price of bit-exact
    * DuckDB-verifiable registers; for true 10¹⁰-scale counting swap the
    * hash for a 64-bit avalanche hash (`xxhash64`) and give up the
    * oracle gate — the aggregate shape and merge algebra are unchanged.
    */
  def hllDistinct(df: DataFrame, keyCol: String,
                  groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "hllDistinct needs at least one group column")
    // NULL keys are ignored, like COUNT(DISTINCT): hashing them yields a
    // NULL register row that count(*) saw but sum(invPow) skipped — off
    // by one in the empty-register term, and with all 64 registers hit,
    // _nreg = 65 drove the raw estimator NEGATIVE. Consequence: a group
    // whose keys are ALL null has no registers and produces NO output row
    // (the GROUP BY runs over the filtered input) — left-join a group
    // list and coalesce to 0 if absent groups must read as estimate 0.
    val input = df.filter(col(keyCol).isNotNull)
    val h = scrambled(col(keyCol))
    val w = graft.functions.IntMath.floorDiv(h, 64L)
    // rank: 1 + lowest set bit of w; w = 0 (prob 2^-32-ish) caps at 32.
    // w & -w isolates the lowest set bit (an exact power of two < 2^30),
    // and log2 of an exact power of two rounds cleanly (|err| ~1e-13 ≪
    // 0.5) — three codegen'd ops per row where the previous form ran a
    // 32-iteration interpreted `aggregate` lambda with a nested array
    // lookup and division per step (measured 9.2x on the whole
    // sketch_hll_users query at sf10: 15.7 -> 1.7 s, same registers
    // bit-for-bit)
    val rho = when(w === 0, lit(32)).otherwise(
      round(log(2.0, w.bitwiseAND(lit(0L) - w))).cast("int") + 1)
    val gcols = groupCols.map(col)
    val regs = input
      .select(gcols :+ (h % 64).cast("int").as("_reg") :+ rho.as("_rho"): _*)
      .groupBy(gcols :+ col("_reg"): _*)
      .agg(max(col("_rho")).as("_m"))
    // Σ 2^-M_j over present registers + 1.0 per empty register — exact
    val invPow = lit(1.0d) / element_at(lit(POW2_33), col("_m") + 1).cast("double")
    val alphaM2 = 0.709 * 64.0 * 64.0
    val empty = (lit(64L) - col("_nreg")).cast("double")
    val raw = lit(alphaM2) / (col("_s") + empty)
    // small-range correction (the standard HLL switch): below 2.5·m the
    // raw estimator biases high, and linear counting over the empty-
    // register fraction — m·ln(m/V) — is the right estimator
    val est = when(raw <= lit(2.5 * 64.0) && col("_nreg") < 64,
      lit(64.0d) * log(lit(64.0d) / empty)).otherwise(raw)
    regs.groupBy(gcols: _*)
      .agg(sum(invPow).as("_s"), count(lit(1)).as("_nreg"))
      .select(gcols :+ round(est, 6).as("hll_estimate"): _*)
  }

  /** Count-min frequency estimates for a set of probe keys (d = 4 hash
    * rows × `width` counters; estimate = min over rows). All-integer —
    * the sketch counters and estimates are exact Longs, so the oracle
    * reproduces the whole matrix and the estimate bit-for-bit. The
    * classic one-sided guarantee holds: estimate ≥ true count, with
    * overshoot ≤ total/width per row w.h.p.
    *
    * Scale shape: the sketch is one keyed aggregate to at most d×width
    * rows — CONSTANT state regardless of stream size, mergeable by
    * cell-wise sum — and probes are a broadcast join against it. The
    * scramble keeps the d rows pairwise-independent-ish over the
    * portable hash family ([[graft.functions.CrossHash.A]]/B).
    */
  /** Key scramble shared by the sketch family: quadratic round (breaks
    * the polynomial hash's sequential-key linearity in its LOW bits,
    * the original r-era fix) followed by one full-range LCG round mod P.
    * The second round exists because squaring alone is NOT uniform mod
    * small powers of two: for short keys (h₀ < 2¹⁵, e.g. integer ids)
    * h₀² + 12345 never wraps P, so `h % 64` can only land on the ~12
    * quadratic residues mod 64 shifted by 12345 — the r14 invariants
    * gate (tools/invariants.py hll_error) caught 150 distinct user ids
    * collapsing into 21 of 64 HLL registers, estimate 25.5 vs 150
    * (rel err 0.83 against the published 13% for m=64; all THREE
    * implementations agreed because they shared this spec). Multiplying
    * by 1103515245 (≈2³⁰) wraps P for essentially every input, so the
    * residue structure dies while everything stays exact-Long
    * (h < P ≈ 2³⁰ → h·1103515245 < 2⁶⁰) and oracle-portable verbatim.
    * Post-fix register spread for the same 150 ids: 57 of 64, rel err
    * 0.06; count-min row-0 cell spread 54 → 120 of 150. */
  private def scrambled(c: Column): Column = {
    val h0 = polyHash(c.cast("string"))
    val h1 = (h0 * h0 + lit(12345L)) % lit(P)
    (h1 * lit(1103515245L) + lit(12345L)) % lit(P)
  }

  /** Row-`row` count-min cell of a key expression: scrambled portable
    * hash permuted by the family coefficients, folded into [0, width). */
  private def cmCell(c: Column, row: Int, width: Int): Column =
    graft.functions.CrossHash.permuted(scrambled(c), row) % lit(width.toLong)

  /** Exact heavy hitters (count ≥ `threshold`) via a count-min prescreen.
    *
    * Two phases, classic two-pass heavy-hitter shape: (1) build the d×w
    * count-min matrix (one keyed aggregate to ≤ d·w cells — constant
    * state, mergeable) and pull it to the driver as the broadcastable
    * sketch (≤ d·w longs — the same bounded collect-as-broadcast pattern
    * as BPE's merge table); (2) re-scan, filtering each occurrence by its
    * sketch estimate BEFORE any shuffle — count-min only ever
    * OVER-estimates, so the filter has no false negatives and the
    * surviving superset is exactly counted and re-thresholded.
    *
    * Scale shape: the exact-count exchange carries only occurrences of
    * candidate keys, and map-side partial aggregation collapses those to
    * ≤ candidates×partitions rows — the full-vocabulary groupBy (the
    * thing that dies on a 100 TB corpus with a long-tail vocabulary)
    * never happens. The probe itself is a codegen'd literal-array lookup,
    * no join. Output is EXACT (not an estimate), so the DuckDB oracle is
    * a plain GROUP BY ... HAVING.
    */
  def heavyHitters(df: DataFrame, keyCol: String, threshold: Long,
                   width: Int = 256, depth: Int = 4): DataFrame = {
    require(depth > 0 && depth <= A.length, s"depth must be in [1, ${A.length}]")
    require(width > 0, "width must be positive")
    require(threshold > 0, "threshold must be positive")
    val cellsArr = array((0 until depth).map(r => cmCell(col(keyCol), r, width)): _*)
    // NULL keys are excluded, like hllDistinct: polyHash(null) is null,
    // so a null key's cells are null rows whose driver-side getLong
    // would NPE — and the exact phase's estimate-filter drops null keys
    // anyway (least(null..) >= threshold is never true)
    val sketchRows = df
      .filter(col(keyCol).isNotNull)
      .select(posexplode(cellsArr).as(Seq("_row", "_col")))
      .groupBy(col("_row"), col("_col"))
      .agg(count(lit(1)).as("_cnt"))
      .collect()
    val dense = Array.fill(depth)(Array.fill(width)(0L))
    sketchRows.foreach(r => dense(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    val sk = typedLit(dense.map(_.toSeq).toSeq)
    val estimate = (0 until depth).map(r =>
      element_at(element_at(sk, r + 1), (cmCell(col(keyCol), r, width) + 1).cast("int")))
      .reduce(least(_, _))
    df.filter(estimate >= threshold)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }

  def countMin(df: DataFrame, keyCol: String, probes: DataFrame,
               width: Int = 256, depth: Int = 4): DataFrame = {
    require(depth > 0 && depth <= A.length, s"depth must be in [1, ${A.length}]")
    require(width > 0, "width must be positive")
    // one scan: every row emits its d cells via a generator (a union of
    // d selects would re-read the input per hash row)
    def cells(c: Column): Column =
      array((0 until depth).map(r => cmCell(c, r, width)): _*)
    val sketch = df
      .select(posexplode(cells(col(keyCol))).as(Seq("_row", "_col")))
      .groupBy(col("_row"), col("_col"))
      .agg(count(lit(1)).as("_cnt"))
    // LEFT join: a probe key absent from df hits empty (zero-count) cells
    // that the sparse sketch has no row for — an inner join dropped those
    // cells, so min() ran over only the colliding non-empty ones and a
    // never-seen key got an INFLATED estimate (or vanished entirely),
    // breaking the one-sided "min over d rows" bound
    probes
      .select(col(keyCol), posexplode(cells(col(keyCol))).as(Seq("_row", "_col")))
      .join(sketch, Seq("_row", "_col"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("_cnt"), lit(0L))).as("cm_estimate"))
  }

  /** Equi-width histogram quantile estimates per group — the constant-
    * state alternative to the exact `percentile` aggregate (whose state
    * is the whole sorted multiset): values in [0, `maxValue`] land in
    * `nBuckets` integer buckets (overflow clamps to the top), and a
    * quantile is answered from the cumulative histogram as the first
    * bucket whose running count covers q·total, reported as the bucket's
    * upper edge. Everything is integer arithmetic — counts, cumulative
    * sums, the q·total comparison (multiplied through: 100·cum ≥ q%·n) —
    * so estimates hash-match the oracle exactly; error is bounded by one
    * bucket width by construction.
    *
    * Scale shape: one keyed aggregate to ≤ nBuckets rows per group
    * (map-side combine; mergeable by cell-wise sum — the same property
    * as [[hllDistinct]]/[[countMin]]), then a per-group window cumsum
    * over ≤ nBuckets rows. Exact quantiles sort the world; this never
    * holds more than (groups × buckets) longs.
    */
  def histogramQuantiles(df: DataFrame, valueCol: String,
                         groupCols: Seq[String], maxValue: Long,
                         nBuckets: Int = 64,
                         qs: Seq[Int] = Seq(50, 95)): DataFrame = {
    require(groupCols.nonEmpty, "histogramQuantiles needs a group column")
    require(maxValue > 0 && nBuckets > 0, "maxValue and nBuckets must be positive")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 100),
      "quantiles are integer percents in (0, 100]")
    import org.apache.spark.sql.expressions.Window
    val widthNum = maxValue  // bucket = min(v*nBuckets div maxValue, n-1)
    val gcols = groupCols.map(col)
    // clamped on BOTH sides: the doc's contract is values in
    // [0, maxValue], but a negative out-of-contract value used to land
    // in bucket -1 and silently corrupt the cumulative histogram (the
    // top clamp had no symmetric floor)
    val bucket = least(
      greatest(
        graft.functions.IntMath.floorDiv(
          col(valueCol).cast("long") * lit(nBuckets.toLong), widthNum),
        lit(0L)),
      lit(nBuckets - 1L)).cast("int")
    // NULL values are EXCLUDED, like percentile/hllDistinct — without
    // the filter a null bucket expression silently lands in a clamp
    // bucket (least(null,63) skipped nulls into 63; greatest(null,0)
    // would skew them into 0) and biases every quantile
    val hist = df.filter(col(valueCol).isNotNull)
      .select(gcols :+ bucket.as("_b"): _*)
      .groupBy(gcols :+ col("_b"): _*)
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(
        Window.partitionBy(gcols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // upper edge of bucket b = (b+1)·maxValue div nBuckets (integer)
    val edge = graft.functions.IntMath.floorDiv(
      (col("_b") + 1).cast("long") * lit(maxValue), nBuckets.toLong)
    qs.map { q =>
      cum.filter(col("_cum") * 100 >= col("_n") * q)
        .groupBy(gcols: _*)
        .agg(min(edge).as(s"p$q"))
    }.reduce((a, b) => a.join(b, groupCols))
  }
}
