package graft.sources

import graft.sink.{JdbcSink, JdbcTarget}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.DriverManager

/** S5 PK discovery against a real JDBC catalog (embedded Derby — the only
  * in-container database), plus the prepared-statement delete binding.
  */
class PkDiscoverySpec extends AnyFunSuite {

  private val url = "jdbc:derby:memory:pkdisc;create=true"

  private def withDb[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  test("composite primary key is discovered in key-sequence order") {
    withDb { c =>
      c.createStatement().execute(
        "CREATE TABLE COMPOSITE_T (B VARCHAR(10) NOT NULL, A INT NOT NULL, " +
          "V INT, PRIMARY KEY (A, B))")
      // KEY_SEQ order is the PK declaration order (A, B), not column order
      assert(PkDiscovery.primaryKeys(c, Some("APP"), "COMPOSITE_T") == Seq("A", "B"))
    }
  }

  test("single-column PK and no-PK table") {
    withDb { c =>
      c.createStatement().execute(
        "CREATE TABLE SINGLE_T (ID BIGINT NOT NULL PRIMARY KEY, V INT)")
      c.createStatement().execute("CREATE TABLE HEAP_T (X INT, Y INT)")
      assert(PkDiscovery.primaryKeys(c, Some("APP"), "SINGLE_T") == Seq("ID"))
      assert(PkDiscovery.primaryKeys(c, Some("APP"), "HEAP_T").isEmpty)
    }
  }

  test("resolve precedence: config > discovery > loud first-column fallback") {
    assert(PkDiscovery.resolve(Seq("cfg"), Seq("disc"), Seq("f1", "f2"), "t") == Seq("cfg"))
    assert(PkDiscovery.resolve(Nil, Seq("disc", "d2"), Seq("f1"), "t") == Seq("disc", "d2"))
    assert(PkDiscovery.resolve(Nil, Nil, Seq("f1", "f2"), "t") == Seq("f1"))
  }

  test("executePrepared binds quote-containing keys safely") {
    withDb { c =>
      c.createStatement().execute(
        "CREATE TABLE NAMES_T (NAME VARCHAR(20) NOT NULL PRIMARY KEY, V INT)")
      c.createStatement().execute("INSERT INTO NAMES_T VALUES ('O''Brien', 1)")
      c.createStatement().execute("INSERT INTO NAMES_T VALUES ('plain', 2)")
    }
    val t = JdbcTarget(url, "", "", "APP")
    // the dangerous key goes through as a bound parameter, never a literal
    JdbcSink.executePrepared(t, "DELETE FROM NAMES_T WHERE NAME IN (?)", Seq("O'Brien"))
    withDb { c =>
      val rs = c.createStatement().executeQuery("SELECT NAME FROM NAMES_T")
      val names = Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).toList
      assert(names == List("plain"))
    }
  }
}
