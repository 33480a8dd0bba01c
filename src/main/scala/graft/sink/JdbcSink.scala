package graft.sink

import graft.ddl.ClickHouseDdl
import graft.model.Engine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.{Connection, DriverManager}

/** JDBC-backed sink leg (reference operators K1 bulk insert, K2
  * delete-by-PK, K4 DDL apply, K6 database create) for running against a
  * real ClickHouse/warehouse endpoint. The hermetic test/bench path uses
  * [[ParquetStateStore]] instead; this class is the production wiring and
  * is exercised in tests only down to the SQL-string boundary (no live DB
  * in the build container).
  *
  * Scale notes: inserts go through Spark's parallel JDBC writer (one
  * connection per partition, `batchsize` rows per round-trip); deletes are
  * compiled into a single ALTER DELETE per micro-batch per table, mirroring
  * the reference's buffered form.
  */
final case class JdbcTarget(url: String, user: String, password: String,
                            db: String, numPartitions: Int = 8,
                            batchSize: Int = 20000)

object JdbcSink {

  def withConnection[A](t: JdbcTarget)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(t.url, t.user, t.password)
    try f(conn) finally conn.close()
  }

  def execute(t: JdbcTarget, sql: String): Unit =
    withConnection(t) { c => c.createStatement().execute(sql); () }

  /** Execute a '?'-parameterized statement with bound values — the only
    * path data-derived values (delete keys) take to SQL; no literal
    * rendering of user data anywhere.
    */
  def executePrepared(t: JdbcTarget, sql: String, binds: Seq[Any]): Unit =
    withConnection(t) { c =>
      val ps = c.prepareStatement(sql)
      try {
        binds.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
        ps.execute(); ()
      } finally ps.close()
    }

  /** K1: bulk append of a typed batch. */
  def appendBatch(df: DataFrame, t: JdbcTarget, table: String): Unit =
    df.write.mode("append")
      .option("numPartitions", t.numPartitions)
      .option("batchsize", t.batchSize)
      .jdbc(t.url, s"${t.db}.$table",
        new java.util.Properties() {
          put("user", t.user); put("password", t.password)
        })

  /** K2: compile and run the batch's deletes as one prepared statement
    * with bound parameters (single and composite PK alike). `keys` are
    * collected to the driver — bounded by the micro-batch size, as in the
    * reference's buffered delete list. Returns the placeholder SQL.
    */
  def deleteKeys(t: JdbcTarget, table: String, pk: Seq[String],
                 keys: Seq[Seq[Any]]): Option[String] =
    if (keys.isEmpty) None
    else {
      val (sql, binds) = ClickHouseDdl.deleteByPkPrepared(t.db, table, pk, keys)
      executePrepared(t, sql, binds)
      Some(sql)
    }

  /** Apply one deduplicated micro-batch of one table through JDBC:
    * deletes first, then time-ordered inserts (reference flush order,
    * synch/replication/continuous.py:102-139).
    *
    * The delete list covers EVERY touched key, not just keys whose final
    * action is delete: plain MergeTree does not dedup, so an update
    * (delete+insert pair collapsed to its insert half by latestPerKey)
    * must still delete the pre-existing row or the insert duplicates it —
    * the same anti-join-on-touched-keys contract as
    * [[SinkStrategy.mergeTreeApply]].
    */
  def applyMergeTreeBatch(changelog: DataFrame, t: JdbcTarget, table: String,
                          pk: Seq[String]): Unit = {
    val latest = SinkStrategy.latestPerKey(changelog,
      SinkKeys(pk, versionCol = "event_unixtime", tieBreakers = Seq("action_seq")))
    val touched = latest.select(pk.map(col): _*).distinct()
      .collect().map(_.toSeq).toSeq
    deleteKeys(t, table, pk, touched)
    val inserts = latest.filter(col("action") =!= "delete")
      .orderBy(col("event_unixtime"), col("action_seq"))
      .drop("action", "event_unixtime", "action_seq")
    appendBatch(inserts, t, table)
  }

  /** K5/K6: ensure target database and table exist. */
  def ensureTable(t: JdbcTarget, table: String,
                  schema: org.apache.spark.sql.types.StructType, pk: Seq[String],
                  engine: Engine.Value): Unit = {
    execute(t, ClickHouseDdl.createDatabase(t.db))
    execute(t, ClickHouseDdl.createTable(t.db, table, schema, pk, engine))
  }
}
