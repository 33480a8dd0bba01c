package graft.ddl

import graft.model.Engine
import org.apache.spark.sql.types._

/** ClickHouse-dialect DDL rendering for the sink side (reference operator
  * K5: synch/writer/merge_tree.py:38-58 and engine siblings; cluster DDL
  * X3: synch/common.py:51-54).
  *
  * Design difference from the reference: schema inference there runs
  * `CREATE TABLE ... AS SELECT * FROM mysql(...) limit 0` server-side; in
  * a Spark-first engine the snapshot read already carries an exact
  * `StructType`, so the DDL declares columns explicitly — no decimal
  * re-ALTER workaround needed (synch/writer/__init__.py:55-76).
  */
object ClickHouseDdl {

  /** Spark Catalyst type → ClickHouse column type. */
  def renderType(dt: DataType, nullable: Boolean): String = {
    val base = dt match {
      case ByteType => "Int8"
      case ShortType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case BooleanType => "UInt8"
      case DateType => "Date"
      case _: TimestampType | _: TimestampNTZType => "DateTime64(6)"
      case d: DecimalType => s"Decimal(${d.precision},${d.scale})"
      case BinaryType => "String"
      case ArrayType(e, n) => s"Array(${renderType(e, n)})"
      case _ => "String"
    }
    if (nullable && !dt.isInstanceOf[ArrayType]) s"Nullable($base)" else base
  }

  private def engineClause(engine: Engine.Value, sign: String, version: String,
                           cluster: Option[String], db: String, table: String): String = {
    val (base, args) = engine match {
      case Engine.MergeTree => ("MergeTree", "")
      // empty version = ClickHouse's no-arg ReplacingMergeTree
      // (last-insert-wins) — for tables synced without a version column
      case Engine.ReplacingMergeTree =>
        ("ReplacingMergeTree", if (version.isEmpty) "" else quoteId(version))
      case Engine.CollapsingMergeTree => ("CollapsingMergeTree", quoteId(sign))
      case Engine.VersionedCollapsingMergeTree =>
        ("VersionedCollapsingMergeTree", s"${quoteId(sign)}, ${quoteId(version)}")
    }
    // On a cluster the reference swaps in the Replicated twin of EVERY
    // engine with the standard zk path macros (synch/writer/
    // __init__.py:93-94); the engine's own args follow the replication
    // args. A non-replicated engine under ON CLUSTER would give each
    // replica an independent table and reads would miss data.
    cluster match {
      case Some(_) =>
        val zk = s"'/clickhouse/tables/{shard}/$db/$table', '{replica}'"
        val all = if (args.isEmpty) zk else s"$zk, $args"
        s"Replicated$base($all)"
      case None =>
        if (args.isEmpty) base else s"$base($args)"
    }
  }

  private def onCluster(cluster: Option[String]): String =
    cluster.map(c => s" ON CLUSTER $c").getOrElse("")

  /** Identifier quoting for column references OUTSIDE the backticked
    * column list (ORDER BY, engine args, delete predicates): plain words
    * that cannot collide with keywords stay bare — preserving the
    * reference-golden DDL shape — while names needing quoting (special
    * characters, or reserved words like `order`) are backticked; unquoted
    * they render invalid DDL. */
  private val Reserved = Set("order", "by", "from", "select", "where",
    "group", "limit", "offset", "table", "index", "key", "join", "using",
    "as", "in", "on", "settings", "partition", "primary", "format",
    "sample", "ttl", "engine")
  private def quoteId(name: String): String =
    if (name.matches("[A-Za-z_][A-Za-z0-9_]*") && !Reserved(name.toLowerCase))
      name
    else s"`${name.replace("`", "``")}`"

  /** CREATE TABLE with explicit columns (PK columns forced non-nullable —
    * ClickHouse ORDER BY keys cannot be Nullable). */
  def createTable(db: String, table: String, schema: StructType, pk: Seq[String],
                  engine: Engine.Value = Engine.MergeTree,
                  signColumn: String = "sign", versionColumn: String = "version",
                  partitionBy: Option[String] = None,
                  engineSettings: Option[String] = None,
                  cluster: Option[String] = None): String = {
    val cols = schema.fields.map { f =>
      val nullable = f.nullable && !pk.contains(f.name)
      // unconditional backticks (the reference-golden form), but with
      // embedded backticks DOUBLED like quoteId does (r13 review: an
      // unescaped backtick in a column name rendered malformed DDL)
      s"`${f.name.replace("`", "``")}` ${renderType(f.dataType, nullable)}"
    }.mkString(", ")
    val quoted = pk.map(quoteId)
    val orderBy = if (quoted.size == 1) quoted.head else quoted.mkString("(", ",", ")")
    val part = partitionBy.map(p => s" PARTITION BY $p").getOrElse("")
    val settings = engineSettings.map(s => s" SETTINGS $s").getOrElse("")
    s"CREATE TABLE IF NOT EXISTS $db.$table${onCluster(cluster)} ($cols) " +
      s"ENGINE = ${engineClause(engine, signColumn, versionColumn, cluster, db, table)}" +
      s"$part ORDER BY $orderBy$settings"
  }

  /** Distributed proxy table for cluster fan-out (X3,
    * synch/replication/etl.py:57-63). */
  def createDistributed(db: String, table: String, suffix: String,
                        cluster: String, shardingKey: String): String =
    s"CREATE TABLE IF NOT EXISTS $db.$table$suffix ON CLUSTER $cluster " +
      s"AS $db.$table ENGINE = Distributed($cluster, $db, $table, $shardingKey)"

  def createDatabase(db: String, cluster: Option[String] = None): String =
    s"CREATE DATABASE IF NOT EXISTS $db${onCluster(cluster)}"

  /** DELETE-by-PK statement (reference K2, synch/writer/merge_tree.py:14-36;
    * goldens in tests/test_writer.py:20-48). Single PK → parameterized IN;
    * composite PK → OR of ANDs with literal rendering.
    *
    * This is the reference-golden *shape* only — execution goes through
    * [[deleteByPkPrepared]]: SURVEY.md's appendix flags the reference's
    * interpolated composite delete as a quirk NOT to replicate (a key
    * containing a quote breaks the statement).
    */
  def deleteByPk(db: String, table: String, pk: Seq[String],
                 keys: Seq[Seq[Any]]): (String, Option[Seq[Any]]) =
    if (pk.size == 1) {
      (s"alter table $db.$table delete where ${pk.head} in %(pks)s",
        Some(keys.map(_.head)))
    } else {
      val disjuncts = keys.map { key =>
        pk.zip(key).map {
          case (c, v: String) => s"$c='$v'"
          case (c, v) => s"$c=$v"
        }.mkString("(", " and ", ")")
      }.mkString(" or ")
      (s"alter table $db.$table delete where $disjuncts", None)
    }

  /** Injection-safe DELETE-by-PK: '?' placeholders + flattened bind values
    * for a `PreparedStatement`. Single PK → `pk in (?,...)`; composite →
    * OR of per-tuple `(a=? and b=?)` conjuncts. Bind order matches the
    * placeholder order exactly.
    */
  def deleteByPkPrepared(db: String, table: String, pk: Seq[String],
                         keys: Seq[Seq[Any]]): (String, Seq[Any]) =
    if (pk.size == 1) {
      val holes = keys.map(_ => "?").mkString("(", ",", ")")
      (s"alter table $db.$table delete where ${quoteId(pk.head)} in $holes",
        keys.map(_.head))
    } else {
      val disjunct = pk.map(c => s"${quoteId(c)}=?").mkString("(", " and ", ")")
      (s"alter table $db.$table delete where ${Seq.fill(keys.size)(disjunct).mkString(" or ")}",
        keys.flatten)
    }
}
