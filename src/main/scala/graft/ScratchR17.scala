package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway r17 measurement main (not part of the engine; deleted before
  * the round ends). Times q18's high-cardinality lineitem aggregate with
  * different sum implementations, noop sink, min of 3.
  */
object ScratchR17 {
  def time(label: String, df: => DataFrame, n: Int = 3): Unit = {
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"SCRATCH $label%-28s min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/sfgen/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables(spark, sfDir, "lineitem")
    def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
    def e2(c: org.apache.spark.sql.Column) = (dec2(c) * 100).cast("long")

    // warmup
    li.groupBy(col("l_orderkey")).agg(count(lit(1))).write.format("noop").mode("overwrite").save()

    import graft.functions.CrossHash.{tokens => tok, wordGrams, minHash, polyHash}
    val docs = Tables(spark, sfDir, "documents")
    docs.select(col("doc_id")).write.format("noop").mode("overwrite").save() // warm docs

    time("docs-text-passthrough", docs.select(col("doc_id"), length(col("text"))))
    time("docs-tokens", docs.select(col("doc_id"), size(tok(lower(col("text"))))))
    time("docs-wordgrams3", docs.select(col("doc_id"), size(wordGrams(lower(col("text")), 3))))
    time("docs-minhash-grams3", docs.select(col("doc_id"),
      minHash(wordGrams(lower(col("text")), 3), 8)))
    time("docs-polyhash-text", docs.select(col("doc_id"), polyHash(col("text"))))
    spark.stop()
  }
}
