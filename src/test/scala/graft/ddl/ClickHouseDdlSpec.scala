package graft.ddl

import graft.model.Engine
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ClickHouseDdlSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("amount", DecimalType(10, 2), nullable = true),
    StructField("name", StringType, nullable = true)))

  test("create table renders engine variants with explicit columns") {
    val mt = ClickHouseDdl.createTable("db", "t", schema, Seq("id"))
    assert(mt == "CREATE TABLE IF NOT EXISTS db.t (`id` Int64, `amount` Nullable(Decimal(10,2)), " +
      "`name` Nullable(String)) ENGINE = MergeTree ORDER BY id")
    val rt = ClickHouseDdl.createTable("db", "t", schema, Seq("id"),
      Engine.ReplacingMergeTree, versionColumn = "ver")
    assert(rt.contains("ENGINE = ReplacingMergeTree(ver)"))
    val ct = ClickHouseDdl.createTable("db", "t", schema, Seq("id"),
      Engine.CollapsingMergeTree, signColumn = "sgn")
    assert(ct.contains("ENGINE = CollapsingMergeTree(sgn)"))
    val vt = ClickHouseDdl.createTable("db", "t", schema, Seq("id", "name"),
      Engine.VersionedCollapsingMergeTree)
    assert(vt.contains("ENGINE = VersionedCollapsingMergeTree(sign, version)"))
    assert(vt.contains("ORDER BY (id,name)"))
  }

  test("cluster create swaps to ReplicatedMergeTree with ON CLUSTER") {
    val sql = ClickHouseDdl.createTable("db", "t", schema, Seq("id"),
      partitionBy = Some("toYYYYMM(ts)"), engineSettings = Some("index_granularity=8192"),
      cluster = Some("c1"))
    assert(sql.contains("ON CLUSTER c1"))
    assert(sql.contains("ReplicatedMergeTree('/clickhouse/tables/{shard}/db/t', '{replica}')"))
    assert(sql.contains("PARTITION BY toYYYYMM(ts)"))
    assert(sql.contains("SETTINGS index_granularity=8192"))
  }

  test("every engine gets its Replicated twin on a cluster") {
    val zk = "'/clickhouse/tables/{shard}/db/t', '{replica}'"
    val rt = ClickHouseDdl.createTable("db", "t", schema, Seq("id"),
      Engine.ReplacingMergeTree, versionColumn = "ver", cluster = Some("c1"))
    assert(rt.contains(s"ReplicatedReplacingMergeTree($zk, ver)"))
    val ct = ClickHouseDdl.createTable("db", "t", schema, Seq("id"),
      Engine.CollapsingMergeTree, cluster = Some("c1"))
    assert(ct.contains(s"ReplicatedCollapsingMergeTree($zk, sign)"))
    val vt = ClickHouseDdl.createTable("db", "t", schema, Seq("id"),
      Engine.VersionedCollapsingMergeTree, cluster = Some("c1"))
    assert(vt.contains(s"ReplicatedVersionedCollapsingMergeTree($zk, sign, version)"))
  }

  test("reserved/special PK names are backticked outside the column list") {
    // regression: the column list backticked `order` but ORDER BY (and the
    // delete predicates) rendered it bare — invalid ClickHouse DDL
    val s = StructType(Seq(
      StructField("order", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val ddl = ClickHouseDdl.createTable("db", "t", s, Seq("order"))
    assert(ddl.endsWith("ORDER BY `order`"), ddl)
    // plain names keep the reference-golden bare shape
    assert(ClickHouseDdl.createTable("db", "t", schema, Seq("id"))
      .endsWith("ORDER BY id"))
    val (sql, binds) = ClickHouseDdl.deleteByPkPrepared(
      "db", "t", Seq("order"), Seq(Seq(1L), Seq(2L)))
    assert(sql.contains("`order` in (?,?)") && binds == Seq(1L, 2L))
    val (csql, _) = ClickHouseDdl.deleteByPkPrepared(
      "db", "t", Seq("order", "name"), Seq(Seq(1L, "a")))
    assert(csql.contains("(`order`=? and name=?)"))
  }

  test("distributed proxy and database DDL") {
    assert(ClickHouseDdl.createDistributed("db", "t", "_all", "c1", "rand()") ==
      "CREATE TABLE IF NOT EXISTS db.t_all ON CLUSTER c1 AS db.t ENGINE = Distributed(c1, db, t, rand())")
    assert(ClickHouseDdl.createDatabase("db") == "CREATE DATABASE IF NOT EXISTS db")
  }

  test("delete-by-pk matches reference goldens (tests/test_writer.py)") {
    // single pk → parameterized IN
    val (s1, p1) = ClickHouseDdl.deleteByPk("synch_mysql_test", "test", Seq("id"), Seq(Seq("1"), Seq("2")))
    assert(s1 == "alter table synch_mysql_test.test delete where id in %(pks)s")
    assert(p1.contains(Seq("1", "2")))
    val (s2, p2) = ClickHouseDdl.deleteByPk("synch_mysql_test", "test", Seq("id"), Seq(Seq(1), Seq(2)))
    assert(s2 == "alter table synch_mysql_test.test delete where id in %(pks)s")
    assert(p2.contains(Seq(1, 2)))
    // composite pk → OR of ANDs, ints bare / strings quoted
    val (s3, p3) = ClickHouseDdl.deleteByPk("synch_mysql_test", "test",
      Seq("id", "id2"), Seq(Seq(1, 2), Seq(2, 3)))
    assert(s3 == "alter table synch_mysql_test.test delete where (id=1 and id2=2) or (id=2 and id2=3)")
    assert(p3.isEmpty)
    val (s4, _) = ClickHouseDdl.deleteByPk("synch_mysql_test", "test",
      Seq("id", "id2"), Seq(Seq("1", "2"), Seq("2", "3")))
    assert(s4 == "alter table synch_mysql_test.test delete where (id='1' and id2='2') or (id='2' and id2='3')")
  }

  test("prepared delete renders placeholders only — keys never appear as literals") {
    // single PK: parameterized IN list
    val (s1, b1) = ClickHouseDdl.deleteByPkPrepared("db", "t", Seq("id"),
      Seq(Seq("O'Brien"), Seq("plain")))
    assert(s1 == "alter table db.t delete where id in (?,?)")
    assert(b1 == Seq("O'Brien", "plain"))
    assert(!s1.contains("O'Brien"))
    // composite PK: OR of bound conjuncts, binds flattened in order
    val (s2, b2) = ClickHouseDdl.deleteByPkPrepared("db", "t", Seq("a", "b"),
      Seq(Seq(1, "x'y"), Seq(2, "z")))
    assert(s2 == "alter table db.t delete where (a=? and b=?) or (a=? and b=?)")
    assert(b2 == Seq(1, "x'y", 2, "z"))
    assert(!s2.contains("x'y"))
  }

  test("JdbcDialect renders ClickHouse types and handles ch URLs") {
    assert(ClickHouseDialect.canHandle("jdbc:clickhouse://h:8123/db"))
    assert(!ClickHouseDialect.canHandle("jdbc:postgresql://h/db"))
    assert(ClickHouseDialect.getJDBCType(DecimalType(16, 2)).get.databaseTypeDefinition == "Decimal(16,2)")
    assert(ClickHouseDialect.getJDBCType(TimestampType).get.databaseTypeDefinition == "DateTime64(6)")
    assert(ClickHouseDialect.quoteIdentifier("a b") == "`a b`")
    ClickHouseDialect.register() // idempotent, must not throw
  }

  test("type rendering covers temporal, array and binary") {
    assert(ClickHouseDdl.renderType(TimestampType, nullable = false) == "DateTime64(6)")
    assert(ClickHouseDdl.renderType(ArrayType(FloatType, containsNull = false), nullable = true) == "Array(Float32)")
    assert(ClickHouseDdl.renderType(BinaryType, nullable = true) == "Nullable(String)")
  }
}
