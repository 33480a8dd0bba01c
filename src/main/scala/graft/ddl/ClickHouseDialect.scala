package graft.ddl

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcType}
import org.apache.spark.sql.types._
import java.sql.Types

/** JdbcDialect teaching Spark's JDBC writer ClickHouse's type names and
  * quoting — the rebuild's home for the reference's type-rendering concern
  * (T5 type map + the decimal precision fix, synch/convert.py:28-46,
  * synch/writer/__init__.py:55-76). Register once per JVM:
  * `ClickHouseDialect.register()`.
  *
  * NULLABILITY LIMIT (r13 review): Spark's JDBC auto-create renders a
  * nullable column as the bare type (the JdbcDialect API exposes no
  * per-field nullability), and ClickHouse bare types are NON-nullable —
  * so a `df.write.jdbc` that CREATES its target rejects the first NULL
  * batch. Pre-create tables with [[graft.sink.JdbcSink.ensureTable]]
  * (whose [[ClickHouseDdl.createTable]] wraps Nullable(...) per field,
  * PK columns excepted) and let the writer append; this dialect then
  * only needs to render types for predicates/casts, which it does
  * correctly.
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:clickhouse:") || url.startsWith("jdbc:ch:")

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case ByteType => Some(JdbcType("Int8", Types.TINYINT))
    case ShortType => Some(JdbcType("Int16", Types.SMALLINT))
    case IntegerType => Some(JdbcType("Int32", Types.INTEGER))
    case LongType => Some(JdbcType("Int64", Types.BIGINT))
    case FloatType => Some(JdbcType("Float32", Types.FLOAT))
    case DoubleType => Some(JdbcType("Float64", Types.DOUBLE))
    case BooleanType => Some(JdbcType("UInt8", Types.BOOLEAN))
    case StringType => Some(JdbcType("String", Types.VARCHAR))
    case BinaryType => Some(JdbcType("String", Types.BINARY))
    case DateType => Some(JdbcType("Date", Types.DATE))
    case _: TimestampType | _: TimestampNTZType =>
      Some(JdbcType("DateTime64(6)", Types.TIMESTAMP))
    case d: DecimalType =>
      Some(JdbcType(s"Decimal(${d.precision},${d.scale})", Types.DECIMAL))
    case _ => None
  }

  // ClickHouse identifiers quote with backticks.
  override def quoteIdentifier(colName: String): String = s"`$colName`"

  // ClickHouse has no standard TRUNCATE w/ RESTART; plain TRUNCATE works.
  override def getTruncateQuery(table: String,
                                cascade: Option[Boolean] = None): String =
    s"TRUNCATE TABLE $table"

  def register(): Unit =
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(this)
}
