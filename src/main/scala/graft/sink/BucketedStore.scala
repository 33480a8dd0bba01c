package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed persistence for keyed state — the co-located-join leg of the
  * sink family. [[ParquetStateStore]] versions raw parquet directories;
  * this store writes a *pk-bucketed, pk-sorted* managed table so that
  * every downstream keyed operation over the state — the Replacing/
  * Versioned read-time resolution (`groupBy(pk) → argmax(version)`), a
  * delta `join` on pk, dedup against the snapshot — reuses the on-disk
  * hash partitioning instead of re-shuffling the state.
  *
  * Why it matters at 100 TB: the state side of a CDC apply is the big
  * side (the accumulated table), the delta is the small side. Without
  * bucketing, every micro-batch pays a full exchange of the state;
  * bucketed, only the delta shuffles (to the matching bucket count) and
  * the state is read bucket-aligned — per-batch cost becomes
  * O(delta + state scan) with no state-side exchange. The reference's
  * ClickHouse tables get this from the engine's primary-key ordering
  * (reference: `ORDER BY` key in synch/writer/merge_tree.py:57-58); a
  * bucketed table is the Spark-native equivalent.
  *
  * Pick `buckets` so a bucket of the target table fits an executor's
  * working memory (state_bytes / buckets ≲ a few hundred MB); bucket
  * counts survive appends and are enforced by the metastore schema.
  */
object BucketedStore {

  /** Persist `df` bucketed and sorted by `pkCols` as managed table
    * `name` (overwrite = full snapshot semantics).
    *
    * The input is REPARTITIONED onto the bucket hash first (r13 review):
    * `bucketBy` alone makes every upstream task write its own file per
    * bucket — up to tasks × buckets part files (a 2000-task, 512-bucket
    * state table would mint ~1M files), and a multi-file bucket also
    * voids the per-bucket `sortBy` order the doc's sort-merge-free read
    * claims rest on. Repartitioning on the same keys yields exactly one
    * file per bucket, sorted.
    */
  def write(df: DataFrame, name: String, pkCols: Seq[String],
            buckets: Int): Unit = {
    require(pkCols.nonEmpty, "bucketed store needs at least one pk column")
    require(buckets > 0, "bucket count must be positive")
    df.repartition(buckets, pkCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, pkCols.head, pkCols.tail: _*)
      .sortBy(pkCols.head, pkCols.tail: _*)
      .saveAsTable(name)
  }

  def read(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
