package graft.config

import graft.model.Engine
import org.scalatest.funsuite.AnyFunSuite

/** MiniYaml subset parser + synch.yaml-shaped config loading. */
class YamlSpec extends AnyFunSuite {

  test("parses the reference synch.yaml shape into SyncConfig") {
    val yaml =
      """core:
        |  debug: true # prints SQL when on
        |  insert_num: 500
        |  insert_interval: 5
        |  monitoring: true
        |
        |redis:
        |  host: cache-host
        |  port: 6379
        |  password:
        |  sentinel_hosts:
        |    - 10.0.0.1:5000
        |    - 10.0.0.2:5001
        |
        |source_dbs:
        |  - db_type: mysql
        |    alias: primary_mysql
        |    broker_type: kafka
        |    host: db1.internal
        |    port: 3307
        |    user: repl
        |    password: "s3cret#notacomment"
        |    skip_dmls:
        |      - delete
        |    skip_delete_tables:
        |      - audit_log
        |    databases:
        |      - database: shop
        |        auto_create: true
        |        tables:
        |          - table: orders
        |            skip_decimal: false
        |            auto_full_etl: true
        |            clickhouse_engine: ReplacingMergeTree
        |            partition_by:
        |            settings: index_granularity=4096
        |            sign_column: sign
        |            version_column: updated_at
        |          - table: customers
        |            clickhouse_engine: CollapsingMergeTree
        |            pk:
        |              - tenant_id
        |              - customer_id
        |  - db_type: postgres
        |    alias: analytics_pg
        |    host: db2.internal
        |    user: sync
        |    password: ''
        |    databases:
        |      - database: warehouse
        |        tables:
        |          - table: facts
        |            auto_full_etl: false
        |
        |clickhouse:
        |  hosts:
        |    - ch1:9000
        |  user: default
        |""".stripMargin

    val cfg = SyncConfig.fromYaml(yaml)
    assert(cfg.core.insertNum == 500)
    assert(cfg.core.insertIntervalSec == 5)
    assert(cfg.core.monitoring)

    assert(cfg.sources.size == 2)
    val my = cfg.sources.head
    assert(my.alias == "primary_mysql")
    assert(my.url == "jdbc:mysql://db1.internal:3307")
    assert(my.password == "s3cret#notacomment") // '#' inside quotes kept
    assert(my.skipDmls == Set("delete"))
    assert(my.skipDeleteTables == Set("audit_log"))
    val shop = my.databases.head
    assert(shop.database == "shop")
    assert(shop.tables.map(_.table) == Seq("orders", "customers"))
    val orders = shop.tables.head
    assert(orders.engine == Engine.ReplacingMergeTree)
    assert(orders.versionColumn == "updated_at")
    assert(orders.partitionBy.isEmpty) // empty value → None
    assert(orders.engineSettings.contains("index_granularity=4096"))
    val customers = shop.tables(1)
    assert(customers.engine == Engine.CollapsingMergeTree)
    assert(customers.pk == Seq("tenant_id", "customer_id"))

    val pg = cfg.sources(1)
    assert(pg.dbType == "postgres")
    assert(pg.url == "jdbc:postgresql://db2.internal:5432") // default port
    assert(pg.password == "")
    assert(!pg.databases.head.tables.head.autoFullEtl)
  }

  test("missing or empty clickhouse_engine defaults to ReplacingMergeTree") {
    // reference parity: synch.yaml:48 documents the default as
    // ReplacingMergeTree and factory.py:71-72 maps engine None to it
    val cfg = SyncConfig.fromYaml(
      """source_dbs:
        |  - db_type: mysql
        |    alias: a
        |    host: h
        |    databases:
        |      - database: d
        |        tables:
        |          - table: omitted
        |          - table: empty
        |            clickhouse_engine:
        |          - table: explicit
        |            clickhouse_engine: MergeTree
        |""".stripMargin)
    val tables = cfg.sources.head.databases.head.tables
    assert(tables.find(_.table == "omitted").get.engine == Engine.ReplacingMergeTree)
    assert(tables.find(_.table == "empty").get.engine == Engine.ReplacingMergeTree)
    assert(tables.find(_.table == "explicit").get.engine == Engine.MergeTree)
  }

  test("zero-indent block lists parse as the preceding key's value") {
    val cfg = SyncConfig.fromYaml(
      """core:
        |  insert_num: 7
        |source_dbs:
        |- db_type: mysql
        |  alias: flat
        |  host: h
        |  databases:
        |  - database: d
        |    tables:
        |    - table: t1
        |""".stripMargin)
    assert(cfg.sources.size == 1)
    assert(cfg.sources.head.alias == "flat")
    assert(cfg.sources.head.databases.head.tables.map(_.table) == Seq("t1"))
  }

  test("extra padding after the list dash keeps sibling keys in the item") {
    val cfg = SyncConfig.fromYaml(
      """source_dbs:
        |  -  db_type: mysql
        |     alias: padded
        |     host: h
        |""".stripMargin)
    assert(cfg.sources.head.alias == "padded")
    assert(cfg.sources.head.url == "jdbc:mysql://h:3306")
  }

  test("scalar lists with colons, comments, null markers") {
    val n = MiniYaml.parse(
      """hosts:
        |  - 10.0.0.1:5000 # first
        |  - 10.0.0.2:5001
        |empty:
        |nothing: null
        |quoted: "a: b # c"
        |""".stripMargin)
    assert(n.strings("hosts") == Seq("10.0.0.1:5000", "10.0.0.2:5001"))
    assert(n.get("empty").flatMap(_.scalar).isEmpty)
    assert(n.get("nothing").flatMap(_.scalar).isEmpty)
    assert(n.str("quoted") == "a: b # c")
  }

  test("misaligned or tab indentation fails loud instead of dropping keys") {
    // regression: an outdented key was silently swallowed as a child of
    // the previous entry and then discarded — skip_error quietly reverted
    // to its default where PyYAML rejects the file
    val outdented = intercept[IllegalArgumentException] {
      MiniYaml.parse("core:\n    insert_num: 5\n  skip_error: true\n")
    }
    assert(outdented.getMessage.contains("misaligned"))
    val tabbed = intercept[IllegalArgumentException] {
      MiniYaml.parse("core:\n\tinsert_num: 5\n")
    }
    assert(tabbed.getMessage.contains("tab"))
    val both = intercept[IllegalArgumentException] {
      MiniYaml.parse("key: scalar\n  child: 1\n")
    }
    assert(both.getMessage.contains("both"))
  }

  test("apostrophe inside an unquoted scalar does not absorb the comment") {
    // regression: "bob's" flipped the quote tracker, so the trailing
    // comment leaked into the value
    val n = MiniYaml.parse("alias: bob's db  # production\n")
    assert(n.str("alias") == "bob's db")
  }

  test("apostrophe inside an unquoted KEY does not swallow the colon (r13)") {
    // mapKeySplit lacked stripComment's boundary rule, so `o'brien:`
    // opened a phantom quote at the apostrophe and the line failed to
    // parse as a mapping
    val n = MiniYaml.parse("o'brien: value\nplain: x\n")
    assert(n.str("o'brien") == "value" && n.str("plain") == "x")
  }

  test("missing version_column stays UNSET (the reference's own empty default)") {
    // r13 review: the old "version" default silently resolved on any
    // unrelated source column named `version`; the reference synch.yaml
    // ships `version_column:` EMPTY ("optional" for ReplacingMergeTree)
    val cfg = SyncConfig.fromYaml(
      """mysql:
        |  host: h
        |source_dbs:
        |  - db_type: mysql
        |    alias: a
        |    databases:
        |      - database: db
        |        tables:
        |          - table: t
        |            clickhouse_engine: ReplacingMergeTree
        |""".stripMargin)
    assert(cfg.sources.head.databases.head.tables.head.versionColumn == "",
      "missing version_column must stay unset, never default to 'version'")
  }

  test("YAML-1.1 booleans and long values parse like the reference loader") {
    val cfg = SyncConfig.fromYaml(
      """core:
        |  skip_error: yes
        |  monitoring: 'off'
        |redis:
        |  queue_max_len: 3000000000
        |""".stripMargin)
    assert(cfg.core.skipError)
    assert(cfg.redis.queueMaxLen == 3000000000L)
    val bad = intercept[IllegalArgumentException] {
      MiniYaml.parse("x: maybe\n").bool("x", default = false)
    }
    assert(bad.getMessage.contains("not a boolean"))
  }
}
