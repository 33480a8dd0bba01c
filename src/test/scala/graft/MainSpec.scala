package graft

import java.nio.file.{Files, Paths}

/** CLI smoke: etl + check against the parquet stand-in source. */
class MainSpec extends SparkSpec {

  test("Main etl copies configured tables and check matches counts") {
    val root = Files.createTempDirectory("main").toString
    val props =
      s"""core.insert_num=100
         |source.0.alias=pq
         |source.0.db_type=mysql
         |source.0.url=parquet:$sf
         |source.0.database.0=db
         |source.0.database.0.table.0=orders
         |source.0.database.0.table.1=region
         |""".stripMargin
    val cfgPath = s"$root/graft.properties"
    Files.write(Paths.get(cfgPath), props.getBytes)

    Main.main(Array("etl", cfgPath, "unused", s"$root/state"))
    val orders = spark.read.parquet(s"$root/state/db/orders/v=-1")
    assert(orders.count() == 1500)

    // check mode runs the A5 comparison without throwing
    Main.main(Array("check", cfgPath, "unused", s"$root/state"))
  }

  test("CLI selectors limit etl to --table; --renew drops the store first") {
    val root = Files.createTempDirectory("mainsel").toString
    val props =
      s"""source.0.alias=pq
         |source.0.db_type=mysql
         |source.0.url=parquet:$sf
         |source.0.database.0=db
         |source.0.database.0.table.0=orders
         |source.0.database.0.table.1=region
         |""".stripMargin
    val cfgPath = s"$root/graft.properties"
    Files.write(Paths.get(cfgPath), props.getBytes)

    Main.main(Array("etl", cfgPath, "unused", s"$root/state", "--table=region"))
    assert(!Files.exists(Paths.get(s"$root/state/db/orders")))
    assert(spark.read.parquet(s"$root/state/db/region/v=-1").count() == 5)

    // leave a stale delta behind; --renew must clear it
    Files.createDirectories(Paths.get(s"$root/state/db/region/v=7"))
    Files.write(Paths.get(s"$root/state/db/region/v=7/junk"), "x".getBytes)
    Main.main(Array("etl", cfgPath, "unused", s"$root/state", "--table=region", "--renew"))
    assert(!Files.exists(Paths.get(s"$root/state/db/region/v=7")))
    assert(spark.read.parquet(s"$root/state/db/region/v=-1").count() == 5)

    // selector that matches nothing is a quiet no-op
    Main.main(Array("etl", cfgPath, "unused", s"$root/state", "--schema=absent"))
  }

  test("Main accepts a synch.yaml-shaped config") {
    val root = Files.createTempDirectory("mainyaml").toString
    val yaml =
      s"""core:
         |  insert_num: 100
         |source_dbs:
         |  - db_type: mysql
         |    alias: pq
         |    url: parquet:$sf
         |    databases:
         |      - database: db
         |        tables:
         |          - table: region
         |            clickhouse_engine: MergeTree
         |""".stripMargin
    val cfgPath = s"$root/graft.yaml"
    Files.write(Paths.get(cfgPath), yaml.getBytes)
    Main.main(Array("etl", cfgPath, "unused", s"$root/state"))
    assert(spark.read.parquet(s"$root/state/db/region/v=-1").count() == 5)
  }
}
