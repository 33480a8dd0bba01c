package graft.ddl

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests matching the reference's observable DDL-translation
  * behavior (tests/test_sql_convent.py:7-61, tests/test_mysqlparser.py). */
class DdlSpec extends AnyFunSuite {

  test("add varchar column drops constraints, maps to String") {
    assert(AlterParser.toClickHouse("test",
      "alter table test add name varchar(20) not null after id")
      .contains(("test", "alter table test.test add column name String")))
    assert(AlterParser.toClickHouse("test",
      "alter table test.test add name varchar(20) not null after id")
      .contains(("test", "alter table test.test add column name String")))
  }

  test("add int / decimal / datetime") {
    assert(AlterParser.toClickHouse("test",
      "alter table test add name int not null after id")
      .contains(("test", "alter table test.test add column name Int32")))
    assert(AlterParser.toClickHouse("test",
      "alter table test add name decimal(10,2) not null after id")
      .contains(("test", "alter table test.test add column name Decimal(10,2)")))
    assert(AlterParser.toClickHouse("test",
      "alter table test add name datetime not null after id")
      .contains(("test", "alter table test.test add column name DateTime")))
  }

  test("add column renders its DEFAULT (r14 advisor: convert.py:119-124)") {
    // the reference renders `default '{value}'` for ADD COLUMN exactly as
    // for MODIFY; dropping it created the ClickHouse column with the
    // type default and silently diverged existing rows from the source
    assert(AlterParser.toClickHouse("test",
      "alter table test add column score decimal(16,2) not null default 0")
      .contains(("test",
        "alter table test.test add column score Decimal(16,2) default '0'")))
    // quoted literal keeps its quoting; comment still renders after it
    assert(AlterParser.toClickHouse("test",
      "alter table test add column tag varchar(8) default 'n/a' comment 'x'")
      .contains(("test",
        "alter table test.test add column tag Nullable(String) default 'n/a' comment 'x'")))
    // keyword defaults pass verbatim (deliberate divergence from
    // convert.py:120's unconditional quoting — pinned for MODIFY in r13,
    // same contract here)
    assert(AlterParser.toClickHouse("test",
      "alter table test add column ts datetime default current_timestamp")
      .exists(!_._2.contains("'current_timestamp'")))
  }

  test("nullable add wraps in Nullable") {
    assert(AlterParser.toClickHouse("test",
      "alter table test add name bigint null")
      .contains(("test", "alter table test.test add column name Nullable(Int64)")))
  }

  test("drop column, with and without COLUMN keyword") {
    assert(AlterParser.toClickHouse("test", "alter table test drop column name")
      .contains(("test", "alter table test.test drop column name")))
    assert(AlterParser.toClickHouse("test", "alter table test drop name")
      .contains(("test", "alter table test.test drop column name")))
  }

  test("change column becomes rename") {
    assert(AlterParser.toClickHouse("test",
      "alter table test change `column` column2 int null")
      .contains(("test", "alter table test.test rename column `column` to column2")))
  }

  test("change column captures the restated type") {
    // MySQL CHANGE restates the full definition — the type must not be
    // silently dropped (schema evolution reads it for the retype half)
    assert(AlterParser.parse("alter table test change column qty qty2 bigint not null")
      .contains(AlterParser.ParsedAlter("test",
        AlterParser.ChangeColumn("qty", "qty2", Some("bigint"), notNull = true))))
  }

  test("same-name change is a type change, not a rename") {
    // `CHANGE qty qty BIGINT` is MySQL's idiomatic retype: rendering it as
    // a rename would be a no-op (and the old store-side rename transform
    // destroyed the column outright)
    assert(AlterParser.toClickHouse("test",
      "alter table test change column qty qty bigint")
      .contains(("test", "alter table test.test modify column qty Nullable(Int64)")))
    assert(AlterParser.toSparkSql("db",
      "alter table test change column qty qty bigint")
      .contains("ALTER TABLE db.test ALTER COLUMN qty TYPE BIGINT"))
  }

  test("modify column with comment and default") {
    assert(AlterParser.toClickHouse("test",
      "alter table test modify column `channel` varchar(20) not null comment '渠道'")
      .contains(("test", "alter table test.test modify column `channel` String comment '渠道'")))
    assert(AlterParser.toClickHouse("test",
      "alter table test modify column `giving_money` decimal(16,2) not null default 0 comment '赠送金额'")
      .contains(("test",
        "alter table test.test modify column `giving_money` Decimal(16,2) default '0' comment '赠送金额'")))
  }

  test("unparseable statements are dropped, not thrown") {
    assert(AlterParser.toClickHouse("test", "create table foo (id int)").isEmpty)
    assert(AlterParser.toClickHouse("test", "alter table test engine=InnoDB").isEmpty)
  }

  test("non-column ADD/DROP subcommands are dropped, not misread as columns") {
    // routine MySQL index DDL must not fabricate a column named INDEX/KEY
    assert(AlterParser.toClickHouse("test",
      "alter table test add index idx_name (col)").isEmpty)
    assert(AlterParser.toClickHouse("test",
      "alter table test add unique key uq_name (a, b)").isEmpty)
    assert(AlterParser.toClickHouse("test",
      "alter table test add primary key (id)").isEmpty)
    assert(AlterParser.toClickHouse("test",
      "alter table test add constraint fk foreign key (a) references o(b)").isEmpty)
    assert(AlterParser.toClickHouse("test",
      "alter table test drop index idx_name").isEmpty)
    assert(AlterParser.toClickHouse("test",
      "alter table test drop primary key").isEmpty)
    // a backticked column named `index` is still a column
    assert(AlterParser.toClickHouse("test",
      "alter table test add `index` int null")
      .contains(("test", "alter table test.test add column `index` Nullable(Int32)")))
  }

  test("constraint words inside DEFAULT literals are not constraints (r13)") {
    // the same literal-blindness fix as COMMENT below, for DEFAULT
    assert(AlterParser.toClickHouse("db",
      "alter table t modify column c varchar(9) default 'not null'")
      .contains(("db",
        "alter table db.t modify column c Nullable(String) default 'not null'")))
    // and the word 'comment' inside a DEFAULT literal is data, not a
    // clause (the literal-span scanner closed the last of this class)
    assert(AlterParser.toClickHouse("db",
      "alter table t modify column c varchar(99) default 'add comment later'")
      .contains(("db",
        "alter table db.t modify column c Nullable(String) default 'add comment later'")))
    // parenthesized zero-fsp forms are not valid ClickHouse spellings
    assert(AlterParser.toClickHouse("db",
      "alter table t modify column c datetime default CURRENT_TIMESTAMP()")
      .contains(("db",
        "alter table db.t modify column c Nullable(DateTime) default now()")))
  }

  test("constraint words inside COMMENT literals are not constraints") {
    assert(AlterParser.toClickHouse("test",
      "alter table test modify column note varchar(20) comment 'value is not null by default here'")
      .contains(("test",
        "alter table test.test modify column note Nullable(String) comment 'value is not null by default here'")))
  }

  test("type map: MySQL -> ClickHouse and Spark") {
    assert(TypeMap.toClickHouse("tinyint") == "Int8")
    assert(TypeMap.toClickHouse("mediumint") == "Int32")
    assert(TypeMap.toClickHouse("char(8)") == "FixedString(8)")
    assert(TypeMap.toClickHouse("bool") == "UInt8")
    assert(TypeMap.render("int", nullable = true) == "Nullable(Int32)")
    assert(TypeMap.toSpark("decimal(16,2)") == DecimalType(16, 2))
    assert(TypeMap.toSpark("datetime") == TimestampType)
    assert(TypeMap.toSpark("json") == StringType)
  }

  test("spark-side schema evolution SQL") {
    assert(AlterParser.toSparkSql("db",
      "alter table test add name varchar(20) not null after id")
      .contains("ALTER TABLE db.test ADD COLUMNS (name STRING)"))
    assert(AlterParser.toSparkSql("db", "alter table test drop column name")
      .contains("ALTER TABLE db.test DROP COLUMN name"))
  }

  test("multi-clause ALTERs are REFUSED whole, never half-parsed (r13)") {
    // the old parser matched the first clause and swallowed the rest into
    // its constraint tail: column `a` picked up clause 2's NOT NULL and
    // column `b` was silently never created (state nulled its values).
    // The reference half-parses too (convert.py alter_specification[0]) —
    // refusing loudly is the deliberate-divergence class of the T3 fix.
    assert(AlterParser.parse(
      "alter table t add column a int, add column b int not null").isEmpty)
    assert(AlterParser.parse(
      "alter table t drop column a, drop column b").isEmpty)
    assert(AlterParser.parse(
      "alter table t change a a bigint, modify b int").isEmpty)
    // commas inside type params and string literals are NOT clause breaks
    assert(AlterParser.parse(
      "alter table t add column d decimal(10,2)").isDefined)
    assert(AlterParser.parse(
      "alter table t add column e varchar(9) default 'a, add column fake int'")
      .isDefined)
    // an apostrophe inside a BACKTICKED identifier is not a literal
    // opener (c5a6bb1 meta-review: it blanked the rest of the statement
    // and let a real second clause slip past the refusal)
    assert(AlterParser.parse(
      "alter table t add `it's` int, add c2 int not null").isEmpty)
    assert(AlterParser.parse("alter table t add `it's` int null").isDefined)
    // clause keywords INSIDE a backticked identifier are data too
    // (meta-review of b702589): a column named `x, add y` is one clause
    assert(AlterParser.parse("alter table t add `x, add y` int null")
      .exists(_.action == AlterParser.AddColumn("`x, add y`", "int",
        notNull = false, None, None, None)))
    // the AFTER position captures the ORIGINAL identifier, not the
    // blanked projection (meta-review of 096ff58)
    assert(AlterParser.parse("alter table t add c int after `my col`")
      .exists(_.action == AlterParser.AddColumn("c", "int",
        notNull = false, None, None, Some("`my col`"))))
  }

  test("property: constructed ALTERs round-trip their literals; constructed multi-clauses always refuse (r13)") {
    // differential fuzz over the literal-span scanner: statements are
    // ASSEMBLED from known parts (identifiers with apostrophes/commas/
    // keywords inside backticks, defaults and comments whose literals
    // contain every trap the meta-review chain hit), so the expected
    // parse is known by construction — the scanner must recover the
    // exact inner text, never throw, and refuse every 2-clause form
    val rnd = new scala.util.Random(0xDD13)
    val idents = Seq("c1", "`it's`", "`x, add y`", "`not null`", "`o``k`")
    val trickyLits = Seq("plain", "not null", "add comment later",
      "a, add column fake int", """can\'t""", "it''s", "default x")
    (1 to 200).foreach { trial =>
      val id = idents(rnd.nextInt(idents.length))
      val dflt = trickyLits(rnd.nextInt(trickyLits.length))
      val cmt = trickyLits(rnd.nextInt(trickyLits.length))
      val nn = rnd.nextBoolean()
      val sql = s"alter table t modify column $id varchar(40)" +
        (if (nn) " not null" else "") + s" default '$dflt' comment '$cmt'"
      val parsed = AlterParser.parse(sql)
      assert(parsed.isDefined, s"trial $trial: $sql")
      parsed.get.action match {
        case AlterParser.ModifyColumn(name, _, gotNn, gotD, gotC) =>
          assert(name == id, s"trial $trial: $sql")
          assert(gotNn == nn, s"trial $trial NOT NULL from a literal: $sql")
          assert(gotD.contains(s"'$dflt'"), s"trial $trial default: $sql -> $gotD")
          assert(gotC.contains(cmt), s"trial $trial comment: $sql -> $gotC")
        case other => fail(s"trial $trial: $other for $sql")
      }
      // renderers never throw on any parsed form
      AlterParser.toClickHouse("db", sql)
      AlterParser.toSparkSql("db", sql)
      // the same statement with a second clause appended always refuses
      val second = Seq(", add column zz int", ", drop column zz",
        ", modify zz bigint")(rnd.nextInt(3))
      assert(AlterParser.parse(sql + second).isEmpty,
        s"trial $trial multi-clause slipped through: $sql$second")
    }
  }

  test("UNSIGNED widens one integer step instead of overflowing (r13)") {
    // dropping the modifier mapped unsigned columns to same-width SIGNED
    // types; a legal value past the signed max then from_json-nulled in
    // state. ClickHouse takes its native UInt widths.
    assert(TypeMap.toClickHouse("int unsigned") == "UInt32")
    assert(TypeMap.toClickHouse("bigint unsigned") == "UInt64")
    assert(TypeMap.toSpark("int unsigned") == LongType)
    assert(TypeMap.toSpark("bigint unsigned") == DecimalType(20, 0))
    assert(TypeMap.toSpark("tinyint unsigned") == ShortType)
    assert(AlterParser.toClickHouse("db", "alter table t add column c int unsigned")
      .contains(("db", "alter table db.t add column c Nullable(UInt32)")))
  }

  test("mixed-quoting same-name CHANGE is a retype, not an invalid self-rename (r13)") {
    // `CHANGE `qty` qty BIGINT`: raw comparison saw two different
    // idents and rendered RENAME qty TO qty, which Spark rejects — while
    // Consume.evolveSchema (bare comparison) had already retyped state
    assert(AlterParser.toSparkSql("db", "alter table t change `qty` qty bigint")
      .contains("ALTER TABLE db.t ALTER COLUMN qty TYPE BIGINT"))
    assert(AlterParser.toClickHouse("db", "alter table t change `qty` qty bigint")
      .contains(("db", "alter table db.t modify column qty Nullable(Int64)")))
  }

  test("same-name CHANGE honors the restated NOT NULL like MODIFY does (r13)") {
    assert(AlterParser.toClickHouse("db", "alter table t change qty qty bigint not null")
      .contains(("db", "alter table db.t modify column qty Int64")))
    // ...and the restated DEFAULT/COMMENT too (meta-review of f967229)
    assert(AlterParser.toClickHouse("db",
      "alter table t change qty qty bigint default 0 comment 'count'")
      .contains(("db",
        "alter table db.t modify column qty Nullable(Int64) default '0' comment 'count'")))
  }

  test("keyword defaults pass verbatim; escaped quotes survive the capture (r13)") {
    // meta-review of abd855d: quoting a bare NULL/CURRENT_TIMESTAMP turns
    // the keyword into a string literal (the reference has this bug,
    // convert.py:120 — deliberate divergence), and the old '([^']*)'
    // capture truncated at a backslash-escaped quote, emitting an
    // unterminated literal
    assert(AlterParser.toClickHouse("db", "alter table t modify column c int default NULL")
      .contains(("db", "alter table db.t modify column c Nullable(Int32) default NULL")))
    assert(AlterParser.toClickHouse("db",
      "alter table t modify column c datetime default CURRENT_TIMESTAMP")
      .contains(("db", "alter table db.t modify column c Nullable(DateTime) default CURRENT_TIMESTAMP")))
    assert(AlterParser.toClickHouse("db",
      """alter table t modify column c varchar(9) default 'can\'t'""")
      .contains(("db", """alter table db.t modify column c Nullable(String) default 'can\'t'""")))
    // meta-review of b18786e: fractional-seconds forms and synonyms are
    // keywords too, and a bare token carrying quotes (bit literal)
    // doubles them instead of emitting a garbled literal
    // fractional-seconds forms translate to ClickHouse's now64(fsp) and
    // the LOCALTIME(STAMP) synonyms to now() — the MySQL spellings are
    // not valid CH (now()'s argument there is a timezone)
    assert(AlterParser.toClickHouse("db",
      "alter table t modify column c datetime default CURRENT_TIMESTAMP(6)")
      .contains(("db", "alter table db.t modify column c Nullable(DateTime) default now64(6)")))
    assert(AlterParser.toClickHouse("db",
      "alter table t modify column c datetime default LOCALTIMESTAMP")
      .contains(("db", "alter table db.t modify column c Nullable(DateTime) default now()")))
    assert(AlterParser.toClickHouse("db",
      "alter table t modify column c bit(1) default b'1'")
      .exists(_._2.contains("default 'b''1''")))
  }

  test("backslash-escaped quotes inside literals do not fake a clause break (r13)") {
    // meta-review of f967229: MySQL's default \' escaping ended the
    // literal early, and a comma after it falsely tripped the
    // multi-clause refusal — re-parking a perfectly good single ADD
    val p = AlterParser.parse(
      """alter table t add column note varchar(40) default 'can\'t stop, add more later'""")
    assert(p.isDefined, "escaped quote must not fake a clause break")
  }

  test("a backticked table name containing a dot survives stripSchema (r13)") {
    // the old split('.') mangled `a.b` into "b`" — a table no TableSync
    // matches, so the DDL silently skipped schema evolution
    assert(AlterParser.parse("alter table `a.b` add column c int")
      .exists(_.table == "a.b"))
    assert(AlterParser.parse("alter table db.`a.b` add column c int")
      .exists(_.table == "a.b"))
  }
}
