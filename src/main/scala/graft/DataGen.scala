package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-data generator for scale rehearsals beyond the
  * driver-provided `/root/testdata/sf0.1`.
  *
  * The driver testdata stops at sf0.1 (TESTDATA.md); the scale claims in
  * the operator docstrings are structural (plan shapes pinned by PlanSpec).
  * This generator produces the same ten tables, same schemas and closely
  * matched distributions at an arbitrary multiple of sf0.1, so the full
  * bench can be re-run at 10x+ and per-query scaling exponents measured
  * empirically (VERDICT round 5, next-round item 1).
  *
  * Everything is a pure column expression seeded by `xxhash64(id, salt)` —
  * no driver-side RNG, no collect: generation itself is an exercise of the
  * scale discipline (a 100 TB generator must be embarrassingly parallel).
  * Distributions were measured from the sf0.1 parquet footers and samples:
  *   - documents: word-bag text over a ~30-word vocabulary, 8-100 words,
  *     langs en 41% / zh,es,fr,de ~15% each, 20 uniform sources, ~2% exact
  *     duplicates (dup docs copy the text of a low-id template so exact /
  *     incremental dedup queries keep non-trivial output);
  *   - embeddings: 64-dim unit-norm float vectors, 10 label clusters
  *     (cluster center + noise, then L2-normalized);
  *   - events: 30 days, ascending ns timestamps (written as raw int64 ns
  *     exactly like the driver's TIMESTAMP(NANOS) so `Tables` reads both
  *     identically), 5 uniform event types, exponential-ish value;
  *   - TPC-H-ish tables: ranges/categories as observed (see FIXTURES.md §5).
  *
  * Usage: runMain graft.DataGen <outDir> [multiplier]
  * with multiplier relative to sf0.1 (default 10 = "sf1").
  */
object DataGen {
  /** 0..n-1 pseudo-uniform long derived from (cols..., salt). */
  private def u(salt: String, n: Long, cols: org.apache.spark.sql.Column*) =
    pmod(xxhash64((cols :+ lit(salt)): _*), lit(n))

  private val vocab = Seq(
    "spark", "table", "scan", "join", "column", "order", "small", "sort",
    "fast", "value", "hash", "slow", "line", "part", "batch", "query",
    "agg", "big", "merge", "group", "stream", "filter", "row", "key",
    "vector", "data", "window", "customer", "the", "a")

  /** Deterministic funnel fixture (r16, VERDICT r15 #5a): on the driver's
    * testdata EVERY user saturates at funnel stage 3 at every sf, so the
    * funnel invariant's final-value comparison could not distinguish the
    * greedy order-sensitive contract from a rival order-insensitive
    * distinct-type-count semantics — declared as a KNOWN FIXTURE LIMIT in
    * invariants.py since r15. This fixture covers stages 0-3 with
    * material counts AND order-distinguishing sequences (click-before-
    * view, purchase-first) where the two semantics give different FINAL
    * values. 600 users over a fixed 12-pattern menu — pure literals, no
    * RNG, so the dump is bit-stable across runs. Verify dumps both the
    * fixture and the engine's funnel over it; invariants.py re-derives
    * the greedy finals definitionally and asserts the rival semantics
    * disagrees on a material user count. */
  def funnelFixtureEvents(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // pattern menu: (sequence, expected greedy stage) — rival
    // distinct-type-count disagrees on patterns 4, 6, 7, 9, 11
    val menu: Seq[Seq[String]] = Seq(
      Seq("error"),                                       // 0
      Seq("view"),                                        // 1
      Seq("view", "signup", "view"),                      // 1
      Seq("view", "click"),                               // 2
      Seq("view", "purchase", "click"),                   // 2 (rival: 3)
      Seq("view", "click", "purchase"),                   // 3
      Seq("click", "view"),                               // 1 (rival: 2)
      Seq("purchase", "click", "view"),                   // 1 (rival: 3)
      Seq("view", "click", "purchase", "view", "click"),  // 3
      Seq("purchase"),                                    // 0 (rival: 1)
      Seq("view", "view", "click", "click", "purchase"),  // 3
      Seq("click", "purchase"))                           // 0 (rival: 2)
    val t0Us = 1704067200000000L // 2024-01-01T00:00:00Z in micros
    val rows = for {
      u <- 0L until 600L
      (et, k) <- menu((u % menu.length).toInt).zipWithIndex
    } yield (u * 100L + k, t0Us + u * 1000000L + k * 1000L, u, et)
    rows.toDF("event_id", "ts_us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"))
  }

  def main(args: Array[String]): Unit = {
    SettleGuard.install()
    require(args.nonEmpty,
      "usage: DataGen <outDir> [multiplier-vs-sf0.1] [srcSfDir]")
    val outDir = args(0)
    val mult = if (args.length > 1) args(1).toDouble else 10.0
    val srcSf =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session()
    gen(spark, outDir, mult, srcSf)
    spark.stop()
  }

  def gen(spark: SparkSession, outDir: String, mult: Double,
          srcSfDir: String = "/root/testdata/sf0.1"): Unit = {
    // sf0.1 row counts (measured); embeddings grew 4x per 10x in the driver
    // data (500 @ sf0.01 -> 2000 @ sf0.1), documents 10x — keep those ratios.
    def m(base: Long): Long = math.max(1L, (base * mult).toLong)
    val nCust = m(15000); val nSupp = m(1000); val nPart = m(20000)
    val nOrders = m(150000); val nEvents = m(1000000 / 10); val nUsers = m(1500)
    val nDocs = m(5000)
    val nVecs = math.max(1L, (2000 * math.pow(mult, math.log(4) / math.log(10))).toLong)

    // RANGE-partitioned + sorted by the table's id (r13 review): the
    // driver writes each table ascending within files, so parquet
    // row-group min/max stats prune id/time-correlated scans; a
    // round-robin repartition spread every row group across the full
    // key range and the 10x+ scaling exponents were measured on a
    // physically DIFFERENT layout than driver-shaped data for exactly
    // the queries where locality matters (sessionization, asof joins).
    def write(df: DataFrame, name: String, files: Int,
              orderCol: String): Unit =
      df.repartitionByRange(files, col(orderCol))
        .sortWithinPartitions(orderCol)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/$name.parquet")

    // region / nation are fixed dimension tables — reproduce the driver's
    // values verbatim by copying from the provided source sf data.
    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$srcSfDir/$t.parquet")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")

    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    write(
      spark.range(nCust).select(
        col("id").as("c_custkey"),
        format_string("Customer#%09d", col("id")).as("c_name"),
        u("cn", 25, col("id")).cast("int").as("c_nationkey"),
        round(u("cb", 1100000, col("id")) / 100.0 - 1000.0, 2).as("c_acctbal"),
        element_at(typedLit(segs), (u("cs", 5, col("id")) + 1).cast("int")).as("c_mktsegment")),
      "customer", 8, "c_custkey")

    write(
      spark.range(nSupp).select(
        col("id").as("s_suppkey"),
        format_string("Supplier#%09d", col("id")).as("s_name"),
        u("sn", 25, col("id")).cast("int").as("s_nationkey"),
        round(u("sb", 1100000, col("id")) / 100.0 - 1000.0, 2).as("s_acctbal")),
      "supplier", 4, "s_suppkey")

    val adjs = Seq("small", "red", "blue", "green", "large", "shiny", "old", "new")
    val nouns = Seq("ring", "widget", "bolt", "gear", "pin", "cap", "rod", "plate")
    val types = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
    write(
      spark.range(nPart).select(
        col("id").as("p_partkey"),
        concat_ws(" ",
          element_at(typedLit(adjs), (u("pa", 8, col("id")) + 1).cast("int")),
          element_at(typedLit(nouns), (u("pn", 8, col("id")) + 1).cast("int"))).as("p_name"),
        concat(lit("Brand#"), (u("pb", 25, col("id")) + 1)).as("p_brand"),
        element_at(typedLit(types), (u("pt", 6, col("id")) + 1).cast("int")).as("p_type"),
        (u("ps", 50, col("id")) + 1).cast("int").as("p_size"),
        round(lit(900.0) + pmod(col("id"), lit(1000L)) / 10.0, 1).as("p_retailprice")),
      "part", 8, "p_partkey")

    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val orders = spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      u("oc", nCust, col("id")).as("o_custkey"),
      // F/O dominate, P rare — as in the driver data
      when(u("os", 20, col("id")) < 9, "F")
        .when(u("os", 20, col("id")) < 18, "O").otherwise("P").as("o_orderstatus"),
      round(u("op", 49900000, col("id")) / 100.0 + 1000.0, 2).as("o_totalprice"),
      to_timestamp(date_add(lit("1995-01-01").cast("date"),
        u("od", 2405, col("id")).cast("int"))).as("o_orderdate"),
      element_at(typedLit(prios), (u("opr", 5, col("id")) + 1).cast("int")).as("o_orderpriority"))
    write(orders, "orders", 16, "o_orderkey")

    // ~4 lines per order on average (1..7, as observed), generated inside
    // the row — the explode is the only non-trivial op and stays narrow.
    val li = spark.range(nOrders)
      .select(col("id").as("o"),
        posexplode(sequence(lit(1), (u("ln", 7, col("id")) + 1).cast("int"))))
      .select(
        col("o").as("l_orderkey"),
        u("lp", nPart, col("o"), col("pos")).as("l_partkey"),
        u("ls", nSupp, col("o"), col("pos")).as("l_suppkey"),
        (col("pos") + 1).cast("int").as("l_linenumber"),
        (u("lq", 50, col("o"), col("pos")) + 1).cast("double").as("l_quantity"),
        round(u("le", 10410000, col("o"), col("pos")) / 100.0 + 900.0, 2).as("l_extendedprice"),
        (u("ld", 11, col("o"), col("pos")) / 100.0).as("l_discount"),
        (u("lt", 9, col("o"), col("pos")) / 100.0).as("l_tax"),
        element_at(typedLit(Seq("A", "N", "R")),
          (u("lr", 3, col("o"), col("pos")) + 1).cast("int")).as("l_returnflag"),
        element_at(typedLit(Seq("F", "O")),
          (u("ll", 2, col("o"), col("pos")) + 1).cast("int")).as("l_linestatus"),
        to_timestamp(date_add(lit("1995-01-02").cast("date"),
          u("lsd", 2498, col("o"), col("pos")).cast("int"))).as("l_shipdate"))
    write(li, "lineitem", 32, "l_orderkey")

    // events: ascending ns timestamps over 30 days, written as raw int64 ns
    // (the driver writes TIMESTAMP(NANOS); Tables reads both as long via
    // nanosAsLong and rebuilds a us timestamp — identical downstream).
    val t0Ns = 1704067200000000000L // 2024-01-01T00:00:00Z
    val spanNs = 30L * 86400 * 1000000000L
    val stepNs = spanNs / nEvents
    write(
      spark.range(nEvents).select(
        col("id").as("event_id"),
        (lit(t0Ns) + col("id") * stepNs + u("ej", stepNs, col("id"))).as("ts"),
        u("eu", nUsers, col("id")).as("user_id"),
        element_at(typedLit(Seq("signup", "purchase", "view", "click", "error")),
          (u("et", 5, col("id")) + 1).cast("int")).as("event_type"),
        // exponential-ish with mean ~50, min 0, 2-decimal rounding
        round(-log((u("ev", 1000000, col("id")) + 1) / 1000000.0) * 50.0, 2).as("value"),
        format_string("{\"k\": %d}", u("ek", 100, col("id"))).as("props")),
      "events", 16, "event_id")

    // documents: ~2% of docs copy the text of a low-id template (seed is the
    // template id for both word choice and length, so the copy is exact).
    val nTemplates = math.max(1L, nDocs / 50)
    val docs = spark.range(nDocs)
      .withColumn("seed",
        when(u("ddup", 100, col("id")) < 2, pmod(col("id"), lit(nTemplates)))
          .otherwise(col("id")))
      .select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1), (u("dl", 93, col("seed")) + 8).cast("int")),
          i => element_at(typedLit(vocab),
            (u("dw", vocab.size, col("seed"), i) + 1).cast("int")))).as("text"),
        when(u("dg", 100, col("id")) < 41, "en")
          .when(u("dg", 100, col("id")) < 56, "zh")
          .when(u("dg", 100, col("id")) < 71, "es")
          .when(u("dg", 100, col("id")) < 86, "fr").otherwise("de").as("lang"),
        concat(lit("src"), u("dsrc", 20, col("id"))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(docs, "documents", 8, "doc_id")

    // embeddings: cluster center (per label x dim) + noise, L2-normalized.
    val vecs = spark.range(nVecs)
      .withColumn("label", u("el", 10, col("id")).cast("int"))
      .withColumn("raw", transform(sequence(lit(0), lit(63)), d =>
        (u("ec", 2001, col("label"), d) - 1000) / 1000.0 +
          (u("en", 2001, col("id"), d) - 1000) / 1000.0 * 0.35))
      .withColumn("nrm", sqrt(aggregate(col("raw"), lit(0.0), (acc, x) => acc + x * x)))
      .select(
        col("id").as("vec_id"),
        transform(col("raw"), x => (x / col("nrm")).cast("float")).as("embedding"),
        col("label"))
    write(vecs, "embeddings", 4, "vec_id")
  }
}
