package graft.sources

import java.sql.{Connection, DriverManager}
import scala.collection.mutable

/** Primary-key discovery from source catalogs (reference operator S5:
  * MySQL `information_schema.COLUMNS ... COLUMN_KEY='PRI'`,
  * synch/reader/mysql.py:60-73, composite PKs as tuples at :71-72;
  * Postgres `pg_index`/`pg_attribute`, synch/reader/postgres.py:59-66).
  *
  * Spark-native shape: `java.sql.DatabaseMetaData.getPrimaryKeys` is the
  * portable form of both catalog queries and works for every JDBC driver;
  * an information_schema query is kept as the fallback for drivers with
  * incomplete metadata support. Composite keys come back in KEY_SEQ order
  * so downstream dedup (A2), delete-by-PK (K2) and engine ORDER BY all
  * see the same tuple the source defines.
  */
object PkDiscovery {

  private def viaMetadata(conn: Connection, catalog: String, schema: String,
                          table: String): Seq[String] =
    try {
      val rs = conn.getMetaData.getPrimaryKeys(catalog, schema, table)
      val buf = mutable.Buffer.empty[(String, String, Short, String)]
      try {
        while (rs.next()) buf += ((
          Option(rs.getString("TABLE_CAT")).getOrElse(""),
          Option(rs.getString("TABLE_SCHEM")).getOrElse(""),
          rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
      } finally rs.close()
      // A wildcard placement (null catalog AND schema) matches every
      // same-named table across all databases; concatenating their PK
      // rows would fabricate a corrupt composite key (e.g. (id, id)) —
      // only answer when exactly ONE table matched, else fall through to
      // the dialect catalog queries which scope by name.
      val byPlacement = buf.groupBy(r => (r._1, r._2))
      if (byPlacement.size == 1) byPlacement.head._2.sortBy(_._3).map(_._4).toSeq
      else Nil
    } catch { case _: Exception => Nil }

  /** PK column names in ordinal (KEY_SEQ) order via driver metadata;
    * falls back to catalog queries when the driver returns nothing.
    *
    * `schema` is the logical database name, which MySQL exposes as the
    * JDBC *schema* but Postgres exposes as the *catalog* (its JDBC schema
    * is `public`/search_path) — both placements are tried, then a
    * wildcard, then the dialect catalog queries.
    */
  def primaryKeys(conn: Connection, schema: Option[String], table: String): Seq[String] = {
    val s = schema.orNull
    Seq(
      () => viaMetadata(conn, null, s, table),
      () => viaMetadata(conn, s, null, table),      // Postgres: db = catalog
      () => viaMetadata(conn, null, null, table),
      () => infoSchemaPks(conn, schema, table),
      () => pgCatalogPks(conn, table))
      .iterator.map(_.apply()).find(_.nonEmpty).getOrElse(Nil)
  }

  /** information_schema fallback, parameter-bound (MySQL grammar; the
    * COLUMN_KEY='PRI' predicate is the reference's own query). */
  def infoSchemaPks(conn: Connection, schema: Option[String], table: String): Seq[String] =
    try {
      val ps = conn.prepareStatement(
        "SELECT COLUMN_NAME FROM information_schema.COLUMNS " +
          "WHERE TABLE_SCHEMA = ? AND TABLE_NAME = ? AND COLUMN_KEY = 'PRI' " +
          "ORDER BY ORDINAL_POSITION")
      try {
        ps.setString(1, schema.getOrElse(""))
        ps.setString(2, table)
        val rs = ps.executeQuery()
        val buf = mutable.Buffer.empty[String]
        try { while (rs.next()) buf += rs.getString(1) } finally rs.close()
        buf.toSeq
      } finally ps.close()
    } catch { case _: Exception => Nil }

  /** Postgres catalog fallback — the reference's own query shape
    * (pg_index/pg_attribute, synch/reader/postgres.py:59-66), key columns
    * in index order. */
  def pgCatalogPks(conn: Connection, table: String): Seq[String] =
    try {
      val ps = conn.prepareStatement(
        "SELECT a.attname FROM pg_index i " +
          "JOIN pg_attribute a ON a.attrelid = i.indrelid AND a.attnum = ANY(i.indkey) " +
          "WHERE i.indrelid = CAST(? AS regclass) AND i.indisprimary " +
          "ORDER BY array_position(i.indkey, a.attnum)")
      try {
        ps.setString(1, table)
        val rs = ps.executeQuery()
        val buf = mutable.Buffer.empty[String]
        try { while (rs.next()) buf += rs.getString(1) } finally rs.close()
        buf.toSeq
      } finally ps.close()
    } catch { case _: Exception => Nil }

  /** One-shot discovery over a fresh connection. */
  def forJdbc(url: String, user: String, password: String,
              schema: Option[String], table: String): Seq[String] = {
    val conn = DriverManager.getConnection(url, user, password)
    try primaryKeys(conn, schema, table) finally conn.close()
  }

  /** Resolve the sync key: explicit config wins, then catalog discovery,
    * then — loudly, never silently — the first column. The reference
    * always has a catalog to ask; a parquet-backed hermetic run does not,
    * which is the only path that reaches the fallback.
    */
  def resolve(configured: Seq[String], discovered: => Seq[String],
              fieldNames: Seq[String], label: String): Seq[String] =
    if (configured.nonEmpty) configured
    else {
      val d = discovered
      if (d.nonEmpty) d
      else {
        System.err.println(
          s"[pk-discovery] $label: no configured or discovered PK; " +
            s"falling back to first column '${fieldNames.head}'")
        Seq(fieldNames.head)
      }
    }
}
