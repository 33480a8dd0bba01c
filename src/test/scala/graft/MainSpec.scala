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

  test("-t is accepted as the reference's --table alias; unknown short flags rejected") {
    val root = Files.createTempDirectory("maintee").toString
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

    // both short forms select only `region`
    Main.main(Array("etl", cfgPath, "unused", s"$root/state", "-t", "region"))
    assert(!Files.exists(Paths.get(s"$root/state/db/orders")))
    assert(spark.read.parquet(s"$root/state/db/region/v=-1").count() == 5)
    Main.main(Array("etl", cfgPath, "unused", s"$root/state2", "-t=region"))
    assert(!Files.exists(Paths.get(s"$root/state2/db/orders")))

    // a single-dash flag we don't know must fail loudly, not become a
    // positional that silently changes which directories are touched
    val err = intercept[RuntimeException] {
      Main.main(Array("etl", cfgPath, "-x", s"$root/state3"))
    }
    assert(err.getMessage.contains("-x"))

    // -t with no value (trailing, or followed by another flag) must fail
    // loudly, not select zero tables or swallow the next flag
    val trailing = intercept[RuntimeException] {
      Main.main(Array("etl", cfgPath, "unused", s"$root/state4", "-t"))
    }
    assert(trailing.getMessage.contains("-t requires"))
    val flagNext = intercept[RuntimeException] {
      Main.main(Array("etl", cfgPath, "unused", s"$root/state5", "-t", "--renew"))
    }
    assert(flagNext.getMessage.contains("-t requires"))
    assert(!Files.exists(Paths.get(s"$root/state4")) && !Files.exists(Paths.get(s"$root/state5")))
  }

  test("manual etl snapshots auto_full_etl=false tables; flag hygiene") {
    val root = Files.createTempDirectory("mainmanual").toString
    val props =
      s"""source.0.alias=pq
         |source.0.db_type=mysql
         |source.0.url=parquet:$sf
         |source.0.database.0=db
         |source.0.database.0.table.0=region
         |source.0.database.0.table.0.auto_full_etl=false
         |""".stripMargin
    val cfgPath = s"$root/graft.properties"
    Files.write(Paths.get(cfgPath), props.getBytes)

    // regression: etl filtered on autoFullEtl, so the documented manual
    // path for opt-out tables silently did nothing — no snapshot, ever
    Main.main(Array("etl", cfgPath, "unused", s"$root/state"))
    assert(spark.read.parquet(s"$root/state/db/region/v=-1").count() == 5)

    // regression: --renew=false still wiped the store (contains-only test)
    val marker = Paths.get(s"$root/state/db/region/v=0")
    Files.createDirectories(marker)
    Main.main(Array("etl", cfgPath, "unused", s"$root/state", "--renew=false"))
    assert(Files.exists(marker), "--renew=false must not delete the store")

    // regression: a typo'd long flag was silently ignored
    val typo = intercept[IllegalArgumentException] {
      Main.main(Array("etl", cfgPath, "unused", s"$root/state", "--renue"))
    }
    assert(typo.getMessage.contains("--renue"))

    // regression: rewind defaulted to batch 0 — a silent full truncation
    val noId = intercept[RuntimeException] {
      Main.main(Array("rewind", cfgPath, s"$root/ckpt", s"$root/state"))
    }
    assert(noId.getMessage.contains("batch id"))
  }

  test("postgres sources get a per-database URL and schema-qualified dbtable") {
    val pg = graft.config.SourceConfig(
      alias = "pg", dbType = "postgres",
      url = "jdbc:postgresql://db2.internal:5432",
      user = "u", password = "p", databases = Nil)
    // database rides in the URL path (postgres scopes a connection to one
    // database); relation is qualified by the SCHEMA, not the database
    assert(Main.jdbcUrl(pg, "warehouse") == "jdbc:postgresql://db2.internal:5432/warehouse")
    assert(Main.dbtable(pg, "warehouse", "facts") == "public.facts")
    // explicit database in the URL is kept; query string survives
    assert(Main.jdbcUrl(pg.copy(url = "jdbc:postgresql://h:5/mydb"), "w")
      == "jdbc:postgresql://h:5/mydb")
    assert(Main.jdbcUrl(pg.copy(url = "jdbc:postgresql://h:5?ssl=true"), "w")
      == "jdbc:postgresql://h:5/w?ssl=true")
    // mysql keeps db.table and an unqualified URL
    val my = pg.copy(dbType = "mysql", url = "jdbc:mysql://h:3306")
    assert(Main.jdbcUrl(my, "shop") == "jdbc:mysql://h:3306")
    assert(Main.dbtable(my, "shop", "orders") == "shop.orders")
  }

  test("Main corpus runs the training-data pipeline from the CLI") {
    val root = Files.createTempDirectory("maincorpus").toString
    Main.main(Array("corpus", s"$sf/documents.parquet", s"$root/shards",
      "--shards=2", "--min-tokens=5", "--rates=src0:0.5"))
    val out = spark.read.parquet(s"$root/shards")
    assert(out.count() > 0 && out.count() < 500) // filtered + deduped + mixed
    assert(out.columns.contains("split") && out.columns.contains("shard"))
    // bad rates flag fails loud
    intercept[Exception] {
      Main.main(Array("corpus", s"$sf/documents.parquet", s"$root/x", "--rates=bogus"))
    }
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

  test("redis broker URI: bare form uses the config section, host:port overrides") {
    val cfg = graft.config.SyncConfig.fromYaml(
      "redis:\n  host: confhost\n  port: 6390\n  prefix: p\n")
    // parse-only checks: connection is lazy in neither case, so point at
    // a live fake server for construction
    val server = new graft.sources.FakeRedisServer
    try {
      val b1 = Main.redisBroker(s"redis:127.0.0.1:${server.port}", cfg, "a")
      b1.send("db", "{}")
      assert(b1.length("db") == 1)
      b1.close()
      // bare `redis:` resolves host/port from the config — wrong port
      // here, so construction must fail (proves the config path is used)
      intercept[Exception] {
        val b2 = Main.redisBroker("redis:", cfg, "a")
        try b2.send("db", "{}") finally b2.close()
      }
    } finally server.close()
  }

  test("mode-irrelevant flags are rejected, not silently ignored (r14)") {
    // r14 review: the global known-flag set accepted `consume --renew`
    // and `etl --last-batch=5` — validated, then silently ignored: a
    // skipped rewind / missed re-snapshot with no error. Per-mode now.
    val root = Files.createTempDirectory("mainmode").toString
    val props =
      s"""source.0.alias=pq
         |source.0.db_type=mysql
         |source.0.url=parquet:$sf
         |source.0.database.0=db
         |source.0.database.0.table.0=region
         |""".stripMargin
    val cfgPath = s"$root/graft.properties"
    Files.write(Paths.get(cfgPath), props.getBytes)
    val e1 = intercept[IllegalArgumentException] {
      Main.main(Array("etl", cfgPath, "unused", s"$root/state", "--last-batch=5"))
    }
    assert(e1.getMessage.contains("not valid for mode 'etl'"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Main.main(Array("check", cfgPath, "unused", s"$root/state", "--renew"))
    }
    assert(e2.getMessage.contains("not valid for mode 'check'"), e2.getMessage)
    // mode-appropriate flags still work
    Main.main(Array("etl", cfgPath, "unused", s"$root/state", "--renew"))
    assert(spark.read.parquet(s"$root/state/db/region/v=-1").count() == 5)
  }

  test("produce on a multi-source config requires an explicit --alias (r14)") {
    // r14 review: find() silently took the FIRST source, so the other
    // sources' events were dropped or filtered by the wrong schema list
    val root = Files.createTempDirectory("mainprod").toString
    val props =
      s"""source.0.alias=a
         |source.0.db_type=mysql
         |source.0.url=parquet:$sf
         |source.0.database.0=db1
         |source.0.database.0.table.0=region
         |source.1.alias=b
         |source.1.db_type=mysql
         |source.1.url=parquet:$sf
         |source.1.database.0=db2
         |source.1.database.0.table.0=region
         |""".stripMargin
    val cfgPath = s"$root/graft.properties"
    Files.write(Paths.get(cfgPath), props.getBytes)
    val e = intercept[IllegalArgumentException] {
      Main.main(Array("produce", cfgPath, s"file:$root/out", s"$root/raw"))
    }
    assert(e.getMessage.contains("requires --alias"), e.getMessage)
  }

  test("Main streams reports pin state and --upgrade retires legacy streams") {
    val root = Files.createTempDirectory("mainstreams").toString
    val server = new graft.sources.FakeRedisServer
    try {
      val props =
        s"""source.0.alias=a
           |source.0.db_type=mysql
           |source.0.url=parquet:$sf
           |source.0.database.0=db1
           |source.0.database.0.table.0=orders
           |source.0.database.1=db2
           |source.0.database.1.table.0=region
           |""".stripMargin
      val cfgPath = s"$root/graft.properties"
      Files.write(Paths.get(cfgPath), props.getBytes)
      val uri = s"redis:127.0.0.1:${server.port}"
      // craft: db1 legacy (produced, no pin), db2 never produced
      val raw = new graft.sources.RespClient("127.0.0.1", server.port)
      try {
        raw.command("XADD", "synch:a:db1", "0-1", "msg", "{}")
        raw.command("HSET", "synch:a:produced_batch", "db1", "0")
      } finally raw.close()

      Main.main(Array("streams", cfgPath, uri)) // report-only: pin untouched
      assert(server.dumpHash("synch:a:produced_state").isEmpty)
      Main.main(Array("streams", cfgPath, uri, "--upgrade"))
      assert(server.dumpHash("synch:a:produced_state").get("db1")
        .contains("0:0-1:0-1:1"), server.dumpHash("synch:a:produced_state").toString)
      // db2 was never produced: nothing pinned for it
      assert(!server.dumpHash("synch:a:produced_state").contains("db2"))
      // a file broker has no pin records to introspect
      intercept[Exception] { Main.main(Array("streams", cfgPath, "file:/tmp/x")) }
      // a typo'd --alias used to match nothing and print the
      // waiver-retired success line — a silent no-op (r15 advisor)
      val e = intercept[Exception] {
        Main.main(Array("streams", cfgPath, uri, "--alias=typo"))
      }
      assert(e.getMessage.contains("matches no configured source"), e.getMessage)
    } finally server.close()
  }
}
