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
