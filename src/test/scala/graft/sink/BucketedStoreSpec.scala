package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The point of bucketing is what does NOT appear in the plan: keyed
  * operations over the bucketed state must run without a state-side
  * exchange. Asserted here, not assumed.
  */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

  test("read-time resolution over bucketed state plans zero exchanges") {
    val state = (1L to 1000L).map(i => (i % 100, i, s"payload$i"))
      .toDF("pk", "version", "payload")
    BucketedStore.write(state, "graft_bucket_resolve", Seq("pk"), buckets = 4)
    val resolved = BucketedStore.read(spark, "graft_bucket_resolve")
      .groupBy(col("pk")).agg(max(col("version")).as("version"))
    assert(exchanges(resolved) == 0,
      s"bucketed groupBy(pk) must reuse on-disk partitioning:\n${resolved.queryExecution.executedPlan}")
    assert(resolved.count() == 100)
    assert(resolved.filter(col("pk") === 7L).head.getLong(1) == 907L)
  }

  test("delta join on pk shuffles only the delta, never the state") {
    val state = (1L to 1000L).map(i => (i, s"old$i")).toDF("pk", "payload")
    BucketedStore.write(state, "graft_bucket_join", Seq("pk"), buckets = 4)
    val delta = Seq((5L, "new5"), (2000L, "new2000")).toDF("pk", "dp")
    // force a sort-merge path so the bucket partitioning is what's tested
    // (a broadcast of the tiny delta would trivially also avoid it)
    val joined = BucketedStore.read(spark, "graft_bucket_join")
      .hint("merge")
      .join(delta, Seq("pk"), "right")
    val p = joined.queryExecution.executedPlan.toString
    assert(exchanges(joined) == 1,
      s"exactly the delta side should exchange:\n$p")
    assert(joined.count() == 2)
  }

  test("bucketed and plain stores agree on resolved content") {
    val state = (1L to 200L).map(i => (i % 20, i)).toDF("pk", "version")
    BucketedStore.write(state, "graft_bucket_parity", Seq("pk"), buckets = 4)
    val a = BucketedStore.read(spark, "graft_bucket_parity")
      .groupBy("pk").agg(max("version")).as[(Long, Long)].collect().toMap
    val b = state.groupBy("pk").agg(max("version")).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("write lands exactly one file per bucket regardless of input partitioning (r13)") {
    // r13 review finding: bucketBy without a matching repartition writes
    // one file per (upstream task × bucket) — tasks × buckets small
    // files at scale, and multi-file buckets void the per-bucket sortBy
    // order the zero-exchange reads above rely on.
    val state = (1L to 1000L).map(i => (i % 100, i)).toDF("pk", "version")
      .repartition(16) // deliberately mis-partitioned input
    BucketedStore.write(state, "graft_bucket_onefile", Seq("pk"), buckets = 4)
    val loc = spark.sql("DESCRIBE TABLE EXTENDED graft_bucket_onefile")
      .filter(col("col_name") === "Location").head.getString(1)
    val files = new java.io.File(new java.net.URI(loc)).listFiles()
      .filter(f => f.getName.startsWith("part-"))
    assert(files.length == 4,
      s"expected one file per bucket, got ${files.length}: ${files.map(_.getName).toSeq}")
  }
}
