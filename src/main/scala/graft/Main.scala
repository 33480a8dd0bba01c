package graft

import graft.config.SyncConfig
import graft.model.Engine
import graft.ops.CdcOps
import graft.run._
import graft.sink.ParquetStateStore
import graft.streaming.EventSource
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** CLI entry point mirroring the reference's commands
  * (`synch {etl|produce|consume|check}`, synch/cli.py:21-34) over the
  * typed [[SyncConfig]].
  *
  * Source URLs decide the transport: `jdbc:*` → partitioned JDBC;
  * `parquet:<dir>` → parquet directory (hermetic runs). The consume broker
  * is a directory of ChangeEvent JSON (`file:<dir>`) or a Kafka bootstrap
  * (`kafka:<servers>/<topic>`).
  *
  * Usage: `graft.Main <etl|produce|consume|check> <config.properties> [broker] [stateRoot]`
  */
object Main {

  def loadProps(path: String): Map[String, String] = {
    val p = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try p.load(in) finally in.close()
    p.asScala.toMap
  }

  /** S5 — the sync key: explicit config beats catalog discovery beats a
    * loud first-column fallback (parquet stand-ins have no catalog).
    * Never a silent guess: discovery reads the source's real PK, composite
    * keys included, in key-sequence order.
    */
  def syncPk(src: graft.config.SourceConfig, db: String,
             t: graft.config.TableConfig,
             schema: org.apache.spark.sql.types.StructType): Seq[String] =
    graft.sources.PkDiscovery.resolve(
      t.pk,
      if (src.url.startsWith("jdbc:"))
        graft.sources.PkDiscovery.forJdbc(src.url, src.user, src.password,
          Some(db), t.table)
      else Nil,
      schema.fieldNames.toSeq, s"$db.${t.table}")

  def source(cfg: graft.config.SourceConfig, db: String, table: String): FullEtl.Source =
    if (cfg.url.startsWith("parquet:"))
      FullEtl.ParquetSource(s"${cfg.url.stripPrefix("parquet:")}/$table.parquet")
    else FullEtl.JdbcSource(cfg.url, s"$db.$table", cfg.user, cfg.password,
      partitionColumn = None)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Main <etl|produce|consume|check|rewind> <config> [broker|checkpoint] [stateRoot] [lastBatchId]")
    val mode = args(0)
    // .yaml/.yml configs use the reference's own synch.yaml shape;
    // anything else is the flat-properties form.
    val cfg =
      if (args(1).endsWith(".yaml") || args(1).endsWith(".yml"))
        SyncConfig.fromYaml(new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1))),
          "UTF-8"))
      else SyncConfig.fromProperties(loadProps(args(1)))
    val preexisting = SparkSession.getActiveSession
    val spark = preexisting.getOrElse(
      Tables.session(sys.env.getOrElse("SPARK_MASTER", "local[32]")))

    mode match {
      case "etl" =>
        // The snapshot lands as the store's batch-0 changelog delta (action/
        // event_unixtime/action_seq stamped), so a later `consume` can append
        // deltas on top without a state rewrite.
        for (src <- cfg.sources; d <- src.databases; t <- d.tables if t.autoFullEtl) {
          val target = s"${args.lift(3).getOrElse("/tmp/graft_state")}/${d.database}/${t.table}/v=0"
          val snap0 = FullEtl.read(spark, source(src, d.database, t.table))
          val snap = Consume.snapshotAsChangelog(
            if (t.engine == Engine.CollapsingMergeTree) CdcOps.withSnapshotSign(snap0) else snap0)
          snap.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(target)
          val c = spark.read.parquet(target).count()
          println(s"[etl] ${d.database}.${t.table}: ${snap0.count()} -> $c rows")
        }

      case "check" =>
        for (src <- cfg.sources; d <- src.databases; t <- d.tables) {
          val stateRoot = args.lift(3).getOrElse("/tmp/graft_state")
          val store = new ParquetStateStore(spark, s"$stateRoot/${d.database}/${t.table}")
          val sourceDf = FullEtl.read(spark, source(src, d.database, t.table))
          val sync = TableSync(d.database, t.table, sourceDf.schema,
            syncPk(src, d.database, t, sourceDf.schema), t.engine)
          Consume.currentState(sync, store) match {
            case Some(tgt) =>
              val res = CdcOps.countCheck(Seq((s"${d.database}.${t.table}", sourceDf, tgt)))
              res.show(false)
            case None => println(s"[check] ${d.database}.${t.table}: target missing")
          }
        }

      case "consume" =>
        val broker = args(2).stripPrefix("file:")
        val stateRoot = args.lift(3).getOrElse("/tmp/graft_state")
        val tables = for (src <- cfg.sources; d <- src.databases; t <- d.tables) yield {
          val schema = FullEtl.read(spark, source(src, d.database, t.table)).schema
          TableSync(d.database, t.table, schema, syncPk(src, d.database, t, schema), t.engine)
        }
        Consume.bootstrap(spark, tables, stateRoot,
          tables.map(t => t.table ->
            source(cfg.sources.head, t.schema, t.table)).toMap)
        val q = Consume.start(spark, EventSource.files(spark, broker), tables,
          stateRoot, s"$stateRoot/_checkpoint", skipError = cfg.core.skipError)
        Lifecycle.withGracefulShutdown(Seq(q))
        q.awaitTermination()

      // Resume override (reference `synch consume --last-msg-id`):
      // `rewind <config> <checkpoint> <stateRoot> <lastBatchId>` — the next
      // `consume` replays everything after that batch.
      case "rewind" =>
        val ckpt = args(2)
        val stateRoot = args.lift(3).getOrElse("/tmp/graft_state")
        val lastBatch = args.lift(4).map(_.toLong).getOrElse(0L)
        val tables = for (src <- cfg.sources; d <- src.databases; t <- d.tables) yield {
          val schema = FullEtl.read(spark, source(src, d.database, t.table)).schema
          TableSync(d.database, t.table, schema, syncPk(src, d.database, t, schema), t.engine)
        }
        val removed = Resume.rewind(spark, ckpt, stateRoot, tables, lastBatch)
        println(s"[rewind] dropped ${removed.size} checkpoint entries; " +
          s"state truncated to batch $lastBatch")

      case "produce" =>
        val broker = args(2).stripPrefix("file:")
        val raw = EventSource.files(spark, args.lift(3).getOrElse("/tmp/graft_raw"))
        val src = cfg.sources.head
        val events = Produce.normalize(raw,
          schemas = src.databases.map(_.database),
          skipDmls = src.skipDmls,
          skipDeleteTables = src.skipDeleteTables,
          skipUpdateTables = src.skipUpdateTables)
        val q = Produce.toFiles(spark, events, broker, s"$broker/_checkpoint")
        Lifecycle.withGracefulShutdown(Seq(q))
        q.awaitTermination()

      case other => sys.error(s"unknown mode $other")
    }
    if ((mode == "etl" || mode == "check") && preexisting.isEmpty) spark.stop()
  }
}
