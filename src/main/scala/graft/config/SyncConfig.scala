package graft.config

import graft.model.Engine

/** Typed sync configuration, mirroring the reference's synch.yaml surface
  * (synch.yaml:1-75; accessors synch/settings.py:33-95). The engine is a
  * library, so configuration is plain case classes; [[SyncConfig.fromProperties]]
  * loads the same keys from a flat properties map for CLI-style use.
  *
  * Reference flags with no Spark-side meaning are kept as documented
  * no-ops for config compatibility:
  *  - `skip_decimal` — TypeMap carries precision/scale exactly (§1.3),
  *    so the stringify workaround is opt-in via CdcOps.stringifyDecimals.
  *  - `sentinel*` — Redis-Sentinel failover is an infra concern below
  *    this engine; point `redis.host` at the sentinel-resolved master.
  */
final case class CoreConfig(
    insertNum: Int = 20000,          // events per flush  (synch.yaml:3)
    insertIntervalSec: Int = 60,     // flush interval    (synch.yaml:4)
    skipError: Boolean = false,
    monitoring: Boolean = true)

/** The reference's `redis:` section (synch.yaml:8-20) — used when the
  * broker URI selects the Redis-Streams transport
  * ([[graft.streaming.RedisBroker]]); `queue_max_len` is the XADD
  * `MAXLEN ~` cap with the reference's lossy-FIFO semantics.
  */
final case class RedisConfig(
    host: String = "localhost",
    port: Int = 6379,
    db: Int = 0,
    password: Option[String] = None,
    prefix: String = "synch",
    queueMaxLen: Long = 200000)

final case class TableConfig(
    table: String,
    // ReplacingMergeTree, matching BOTH loaders' missing-engine default
    // (engineOf; r13 review: the old MergeTree default gave programmatic
    // construction different sink semantics than the same config loaded
    // from yaml/properties)
    engine: Engine.Value = Engine.ReplacingMergeTree,
    autoFullEtl: Boolean = true,     // C4 bootstrap     (synch.yaml:47)
    signColumn: String = "sign",
    // "" = unset, the reference's own default (synch.yaml ships
    // `version_column:` EMPTY — "optional" for ReplacingMergeTree). The
    // old "version" default silently resolved on any unrelated source
    // column that happened to be named `version` (r13 review).
    versionColumn: String = "",
    partitionBy: Option[String] = None,
    engineSettings: Option[String] = None,
    skipDecimal: Boolean = false,
    pk: Seq[String] = Nil)           // explicit sync key; empty → S5 discovery

final case class DatabaseConfig(
    database: String,
    tables: Seq[TableConfig])

final case class SourceConfig(
    alias: String,
    dbType: String,                   // "mysql" | "postgres"
    url: String,
    user: String,
    password: String,
    databases: Seq[DatabaseConfig],
    skipDmls: Set[String] = Set.empty,
    skipDeleteTables: Set[String] = Set.empty,
    skipUpdateTables: Set[String] = Set.empty)

final case class SyncConfig(core: CoreConfig, sources: Seq[SourceConfig],
    redis: RedisConfig = RedisConfig()) {
  /** Count-cap + time trigger (operator A1) as stream options. */
  def maxOffsetsPerTrigger: Long = core.insertNum.toLong
  def triggerInterval: String = s"${core.insertIntervalSec} seconds"
}

object SyncConfig {

  /** Reference parity for BOTH loaders: a missing or empty engine means
    * ReplacingMergeTree (synch.yaml:48 "default ReplacingMergeTree";
    * synch/factory.py:71-72 maps engine None to the Replacing writer).
    */
  private def engineOf(raw: Option[String]): Engine.Value =
    raw.map(_.trim).filter(_.nonEmpty).map(Engine.withName)
      .getOrElse(Engine.ReplacingMergeTree)

  /** Loader for the reference's own `synch.yaml` shape
    * (/root/reference/synch.yaml; accessors synch/settings.py:33-95) via
    * the dependency-free [[MiniYaml]] subset parser — a reference user
    * can point the engine at their existing config file.
    *
    * The `redis:` section is honored when the broker URI selects the
    * Redis-Streams transport; the remaining transport sections
    * (kafka/clickhouse/mail) configure infrastructure the Spark engine
    * replaces with checkpointed streams and JDBC sinks — they parse
    * fine and are ignored here.
    */
  def fromYaml(text: String): SyncConfig = {
    val root = MiniYaml.parse(text)
    val core = root.get("core").map { c =>
      CoreConfig(
        insertNum = c.int("insert_num", 20000),
        insertIntervalSec = c.int("insert_interval", 60),
        skipError = c.bool("skip_error", default = false),
        monitoring = c.bool("monitoring", default = true))
    }.getOrElse(CoreConfig())

    val redis = root.get("redis").map { r =>
      RedisConfig(
        host = r.str("host", "localhost"),
        port = r.int("port", 6379),
        db = r.int("db", 0),
        password = r.get("password").flatMap(_.scalar).filter(_.nonEmpty),
        prefix = r.str("prefix", "synch"),
        // long: XADD MAXLEN caps above Int.MaxValue are legal, and the
        // properties loader already accepts them — the two loaders must
        // agree on the same documented key
        queueMaxLen = r.long("queue_max_len", 200000L))
    }.getOrElse(RedisConfig())

    val sources = root.get("source_dbs").map(_.items).getOrElse(Nil).map { s =>
      val dbType = s.str("db_type", "mysql")
      val host = s.str("host", "localhost")
      val port = s.int("port", if (dbType == "postgres") 5432 else 3306)
      val scheme = if (dbType == "postgres") "postgresql" else dbType
      val databases = s.get("databases").map(_.items).getOrElse(Nil).map { d =>
        val tables = d.get("tables").map(_.items).getOrElse(Nil).map { t =>
          TableConfig(
            table = t.str("table"),
            engine = engineOf(Some(t.str("clickhouse_engine", ""))),
            autoFullEtl = t.bool("auto_full_etl", default = true),
            signColumn = t.str("sign_column", "sign"),
            versionColumn = t.str("version_column", ""),
            partitionBy = t.get("partition_by").flatMap(_.scalar),
            engineSettings = t.get("settings").flatMap(_.scalar),
            skipDecimal = t.bool("skip_decimal", default = false),
            pk = t.strings("pk"))
        }
        DatabaseConfig(d.str("database"), tables)
      }
      SourceConfig(
        alias = s.str("alias"),
        dbType = dbType,
        url = s.get("url").flatMap(_.scalar)
          .getOrElse(s"jdbc:$scheme://$host:$port"),
        user = s.str("user"),
        password = s.str("password"),
        databases = databases,
        skipDmls = s.strings("skip_dmls").toSet,
        skipDeleteTables = s.strings("skip_delete_tables").toSet,
        skipUpdateTables = s.strings("skip_update_tables").toSet)
    }
    SyncConfig(core, sources, redis)
  }

  /** Flat-properties loader, e.g.
    * {{{
    * core.insert_num=20000
    * source.0.alias=mysql_db
    * source.0.db_type=mysql
    * source.0.url=jdbc:mysql://host:3306
    * source.0.database.0=test
    * source.0.database.0.table.0=orders
    * source.0.database.0.table.0.engine=ReplacingMergeTree
    * }}}
    */
  def fromProperties(props: Map[String, String]): SyncConfig = {
    def p(key: String, default: String = ""): String = props.getOrElse(key, default)
    val core = CoreConfig(
      insertNum = p("core.insert_num", "20000").toInt,
      insertIntervalSec = p("core.insert_interval", "60").toInt,
      skipError = p("core.skip_error", "false").toBoolean,
      monitoring = p("core.monitoring", "true").toBoolean)

    val redis = RedisConfig(
      host = p("redis.host", "localhost"),
      port = p("redis.port", "6379").toInt,
      db = p("redis.db", "0").toInt,
      password = props.get("redis.password").filter(_.nonEmpty),
      prefix = p("redis.prefix", "synch"),
      queueMaxLen = p("redis.queue_max_len", "200000").toLong)

    val sources = Iterator.from(0)
      .takeWhile(i => props.contains(s"source.$i.alias"))
      .map { i =>
        val databases = Iterator.from(0)
          .takeWhile(d => props.contains(s"source.$i.database.$d"))
          .map { d =>
            val db = p(s"source.$i.database.$d")
            val tables = Iterator.from(0)
              .takeWhile(t => props.contains(s"source.$i.database.$d.table.$t"))
              .map { t =>
                val base = s"source.$i.database.$d.table.$t"
                TableConfig(
                  table = p(base),
                  engine = engineOf(props.get(s"$base.engine")),
                  autoFullEtl = p(s"$base.auto_full_etl", "true").toBoolean,
                  signColumn = p(s"$base.sign_column", "sign"),
                  versionColumn = p(s"$base.version_column", ""),
                  partitionBy = props.get(s"$base.partition_by"),
                  engineSettings = props.get(s"$base.engine_settings"),
                  skipDecimal = p(s"$base.skip_decimal", "false").toBoolean,
                  pk = p(s"$base.pk").split(',').map(_.trim).filter(_.nonEmpty).toSeq)
              }.toSeq
            DatabaseConfig(db, tables)
          }.toSeq
        SourceConfig(
          alias = p(s"source.$i.alias"),
          dbType = p(s"source.$i.db_type", "mysql"),
          url = p(s"source.$i.url"),
          user = p(s"source.$i.user"),
          password = p(s"source.$i.password"),
          databases = databases,
          skipDmls = p(s"source.$i.skip_dmls").split(',').map(_.trim).filter(_.nonEmpty).toSet,
          skipDeleteTables = p(s"source.$i.skip_delete_tables").split(',').map(_.trim).filter(_.nonEmpty).toSet,
          skipUpdateTables = p(s"source.$i.skip_update_tables").split(',').map(_.trim).filter(_.nonEmpty).toSet)
      }.toSeq
    SyncConfig(core, sources, redis)
  }
}
