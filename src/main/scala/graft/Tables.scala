package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated parquet test tables
  * (TESTDATA.md).
  *
  * `events.ts` has shipped in two physical encodings across driver
  * generations: parquet TIMESTAMP(NANOS) — unsupported natively by
  * Spark 4, read as a raw long via
  * `spark.sql.legacy.parquet.nanosAsLong=true` — and plain
  * TIMESTAMP(MICROS) without the UTC flag, which Spark reads as
  * TIMESTAMP_NTZ. Both are normalized here to a µs-precision session
  * (LTZ) timestamp: in a UTC session the NTZ reinterpretation and the
  * nanos`div`1000 rebuild land on the identical instant DuckDB sees when
  * it reads the same file as its naive µs TIMESTAMP, so oracle
  * comparisons line up exactly regardless of which generation wrote the
  * file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Read one test table with canonical typing. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // a raw long could be a future µs/ms generation, not just the known
        // ns one — sanity-check the magnitude of one sampled value (ns-era
        // epochs are ~1e18, µs ~1e15) instead of silently dividing by 1000
        val sample = df.select("ts").filter(col("ts").isNotNull).head(1)
        sample.headOption.map(_.getLong(0)).foreach { v =>
          require(v > 100000000000000000L,
            s"events.ts is a raw long but magnitude $v is not nanosecond-era" +
              " (~1e18); a new driver encoding needs an explicit branch here")
        }
        // nanos-as-long generation; integer `div`, not `/`: double
        // division would round the ns value
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // µs generation: reinterpret the naive value — correct ONLY in a
        // UTC session, which this loader exists to guarantee (r13
        // review: on a caller's non-UTC session the cast silently
        // shifted every instant by the zone offset; fail loudly instead)
        val tz = spark.conf.get("spark.sql.session.timeZone")
        // zone-NORMALIZED check (r13 meta-review): Etc/UTC, GMT, +00:00
        // are all genuinely UTC and must pass; string equality broke them
        val isUtc =
          try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
          catch { case _: Exception => false }
        require(isUtc,
          s"events.ts normalization requires a UTC session (got '$tz'): " +
            "build the session with Tables.session() or set " +
            "spark.sql.session.timeZone=UTC")
        df.withColumn("ts", col("ts").cast("timestamp_ltz"))
      case _ => df
    }
    else df
  }

  /** Register all tables as temp views (names match the DuckDB oracle). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** Session defaults tuned for local[32] but designed for cluster scale:
    * AQE on (runtime re-plan, skew-join splitting), modest shuffle
    * partition count for local mode, UTC session time.
    */
  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
