package graft.sink

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path

/** ParquetStateStore swap-recovery contract: readers NEVER mutate the
  * filesystem. The old design ran the destructive compaction recovery on
  * every listing, so two concurrent readers could race each other into
  * deleting the freshly renamed base (reader B's inner listing saw reader
  * A's rename as a superseded version), and a reader could delete the
  * writer's fully-written-but-not-yet-marked tmp. Now readers resolve the
  * in-flight swap LOGICALLY and only writer entry points perform it.
  */
class StateStoreSpec extends SparkSpec {

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  private def crashAfterMarker(root: String, keep: Long): Unit = {
    // simulate a compact that crashed after its logical commit: a fully
    // written tmp dir carrying the marker, superseded v<=keep still present
    val tmp = s"$root/.compact_tmp_v=$keep"
    df(100L + keep).coalesce(1).write.parquet(tmp)
    Files.createFile(Paths.get(tmp, "_graft_compacted"))
  }

  test("readers present a marker-committed tmp logically without touching disk") {
    val root = Files.createTempDirectory("ssreader").toString + "/s"
    val store = new ParquetStateStore(spark, root)
    store.append(df(1), 0); store.append(df(2), 1)
    crashAfterMarker(root, keep = 1)

    // every read-side surface sees the compacted view...
    assert(store.latestVersion.contains(1L))
    assert(store.read().get.collect().map(_.getLong(0)).toSeq == Seq(101L))
    assert(store.readLog().get.collect().map(_.getLong(0)).toSeq == Seq(101L))
    assert(store.versionStats().map(v => (v._1, v._3)) == Seq((1L, true)))

    // ...but NOTHING was deleted or renamed: the tmp and both superseded
    // versions are still on disk after any number of reads
    val names = Files.list(Paths.get(root)).toArray.map(_.toString.split('/').last).toSet
    assert(names == Set("v=0", "v=1", ".compact_tmp_v=1"))
  }

  test("an unmarked tmp (crashed pre-commit) is invisible to readers and survives reads") {
    val root = Files.createTempDirectory("ssunmarked").toString + "/s"
    val store = new ParquetStateStore(spark, root)
    store.append(df(1), 0)
    // a fully written tmp WITHOUT the marker — the crash point between
    // parquet write and logical commit; a reader deleting it would yank it
    // out from under the writer's marker creation
    df(99L).coalesce(1).write.parquet(s"$root/.compact_tmp_v=0")

    assert(store.read().get.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(Files.exists(Paths.get(s"$root/.compact_tmp_v=0")))
  }

  test("the next writer operation settles the pending swap physically") {
    val root = Files.createTempDirectory("sswriter").toString + "/s"
    val store = new ParquetStateStore(spark, root)
    store.append(df(1), 0); store.append(df(2), 1)
    crashAfterMarker(root, keep = 1)

    store.append(df(3), 2) // writer entry runs the recovery

    val names = Files.list(Paths.get(root)).toArray.map(_.toString.split('/').last).toSet
    assert(names == Set("v=1", "v=2")) // swap completed, superseded v=0 gone
    assert(store.readLog().get.collect().map(_.getLong(0)).toSet == Set(101L, 3L))
  }

  test("compact over a store whose latest version IS a pending swap") {
    // the resolved input plan reads the marker-committed tmp; compact must
    // fully materialize it to the stage before settling the swap, or the
    // plan's file listing dies under the rename
    val root = Files.createTempDirectory("sscompact").toString + "/s"
    val store = new ParquetStateStore(spark, root)
    store.append(df(1), 0); store.append(df(2), 1)
    crashAfterMarker(root, keep = 1)

    store.compact(store.readLog().get) // input := the logical view (the tmp)

    assert(store.readLog().get.collect().map(_.getLong(0)).toSeq == Seq(101L))
    val names = Files.list(Paths.get(root)).toArray.map(_.toString.split('/').last).toSet
    assert(names == Set("v=1"))
  }

  test("dropThrough removes exactly the ids at or below the bound") {
    val root = Files.createTempDirectory("ssdrop").toString + "/s"
    val store = new ParquetStateStore(spark, root)
    store.append(df(1), 3); store.append(df(2), 7); store.append(df(3), 9)
    store.dropThrough(7)
    assert(store.versionIds() == Seq(9L))
    assert(store.readVersion(9L).get.collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(store.readVersion(7L).isEmpty)
  }
}
