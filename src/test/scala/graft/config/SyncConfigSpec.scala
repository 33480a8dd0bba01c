package graft.config

import graft.model.Engine
import org.scalatest.funsuite.AnyFunSuite

class SyncConfigSpec extends AnyFunSuite {

  test("defaults mirror the reference production guidance") {
    val c = SyncConfig(CoreConfig(), Nil)
    assert(c.maxOffsetsPerTrigger == 20000L) // synch.yaml:3
    assert(c.triggerInterval == "60 seconds") // synch.yaml:4
  }

  test("properties loader builds the nested source/database/table tree") {
    val cfg = SyncConfig.fromProperties(Map(
      "core.insert_num" -> "500",
      "source.0.alias" -> "mysql_db",
      "source.0.db_type" -> "mysql",
      "source.0.url" -> "jdbc:mysql://h:3306",
      "source.0.skip_dmls" -> "delete,update",
      "source.0.database.0" -> "test",
      "source.0.database.0.table.0" -> "orders",
      "source.0.database.0.table.0.engine" -> "ReplacingMergeTree",
      "source.0.database.0.table.0.version_column" -> "updated_at",
      "source.0.database.0.table.1" -> "lineitem"))
    assert(cfg.core.insertNum == 500)
    val src = cfg.sources.head
    assert(src.alias == "mysql_db" && src.skipDmls == Set("delete", "update"))
    val tables = src.databases.head.tables
    assert(tables.map(_.table) == Seq("orders", "lineitem"))
    assert(tables.head.engine == Engine.ReplacingMergeTree)
    assert(tables.head.versionColumn == "updated_at")
    // missing engine key: same reference-parity default as the YAML loader
    // (synch/factory.py:71-72 maps engine None to the Replacing writer)
    assert(tables(1).engine == Engine.ReplacingMergeTree)
  }

  test("redis section parses from yaml, with reference defaults when absent") {
    val cfg = SyncConfig.fromYaml(
      """core:
        |  insert_num: 7
        |redis:
        |  host: redis-master
        |  port: 6380
        |  db: 2
        |  password: s3cret
        |  prefix: synch
        |  queue_max_len: 5000
        |""".stripMargin)
    assert(cfg.redis == RedisConfig("redis-master", 6380, 2, Some("s3cret"),
      "synch", 5000L))
    // absent section and empty password fall back to reference defaults
    val bare = SyncConfig.fromYaml("core:\n  insert_num: 1\n")
    assert(bare.redis == RedisConfig())
    val noPass = SyncConfig.fromYaml("redis:\n  host: h\n  password:\n")
    assert(noPass.redis.password.isEmpty && noPass.redis.host == "h")
  }

  test("redis section parses from flat properties") {
    val cfg = SyncConfig.fromProperties(Map(
      "redis.host" -> "r", "redis.port" -> "7000", "redis.db" -> "1",
      "redis.password" -> "p", "redis.queue_max_len" -> "99"))
    assert(cfg.redis == RedisConfig("r", 7000, 1, Some("p"), "synch", 99L))
    assert(SyncConfig.fromProperties(Map.empty).redis == RedisConfig())
  }

  test("empty engine value falls back to ReplacingMergeTree, not a crash") {
    val cfg = SyncConfig.fromProperties(Map(
      "source.0.alias" -> "m", "source.0.db_type" -> "mysql",
      "source.0.url" -> "jdbc:mysql://h:3306",
      "source.0.database.0" -> "test",
      "source.0.database.0.table.0" -> "orders",
      "source.0.database.0.table.0.engine" -> "  "))
    assert(cfg.sources.head.databases.head.tables.head.engine == Engine.ReplacingMergeTree)
  }
}
