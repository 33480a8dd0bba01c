package graft.ddl

/** MySQL `ALTER TABLE` mini-parser + ClickHouse DDL re-writer (operator T5).
  *
  * Reproduces the observable behavior of the reference's mysqlparse-based
  * converter (synch/convert.py:48-131; goldens in
  * tests/test_sql_convent.py:7-61) with a from-scratch regex grammar:
  *
  *  - ADD [COLUMN] name type [constraints]      → `add column name <CH type>`
  *  - DROP [COLUMN] name                        → `drop column name`
  *  - CHANGE [COLUMN] old new type ...          → `rename column old to new`
  *  - MODIFY [COLUMN] name type [default] [comment] → `modify column ...`
  *
  * The `schema.` prefix on the table name is stripped and the target is
  * always rendered `schema.table` (convert.py strips and re-prefixes).
  * Parse failures return None — the caller logs and drops, like the
  * reference (synch/reader/mysql.py:167-171).
  */
object AlterParser {

  sealed trait AlterAction
  final case class AddColumn(column: String, dataType: String, notNull: Boolean,
                             default: Option[String], comment: Option[String],
                             position: Option[String]) extends AlterAction
  final case class DropColumn(column: String) extends AlterAction
  /** MySQL CHANGE restates the full column definition, so it can rename
    * AND retype in one statement (`CHANGE qty qty BIGINT` is the idiomatic
    * same-name type change). `dataType` carries the restated type so
    * schema evolution doesn't silently keep the old one; None only for
    * tolerant parses of non-MySQL dialects that omit it. */
  final case class ChangeColumn(oldName: String, newName: String,
                                dataType: Option[String] = None,
                                notNull: Boolean = false,
                                default: Option[String] = None,
                                comment: Option[String] = None) extends AlterAction
  final case class ModifyColumn(column: String, dataType: String, notNull: Boolean,
                                default: Option[String], comment: Option[String]) extends AlterAction

  final case class ParsedAlter(table: String, action: AlterAction)

  // backticked idents honor MySQL's ``-doubling (a backtick inside a
  // backticked name — the r13 DDL fuzz found the old [^`]+ body split
  // `o``k` at the first close)
  private val Ident = """(`(?:[^`]|``)+`|[\w$]+)"""
  // UNSIGNED rides inside the captured type (r13 review): dropping it
  // mapped unsigned MySQL integers to same-width SIGNED types, and a
  // legal value past the signed range then silently from_json-nulled in
  // state. TypeMap widens unsigned one step per integer width.
  private val Type = """([a-zA-Z]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?(?:\s+unsigned)?)"""
  private val Head = ("""(?is)\s*alter\s+table\s+((?:[\w$]+|`[^`]+`)(?:\.(?:[\w$]+|`[^`]+`))?)\s+(.*?)\s*;?\s*$""").r

  private val Add = ("""(?is)add\s+(?:column\s+)?""" + Ident + """\s+""" + Type + """(.*)""").r
  private val Drop = ("""(?is)drop\s+(?:column\s+)?""" + Ident + """\s*""").r
  private val ChangeTyped = ("""(?is)change\s+(?:column\s+)?""" + Ident + """\s+""" + Ident + """\s+""" + Type + """(.*)""").r
  private val Change = ("""(?is)change\s+(?:column\s+)?""" + Ident + """\s+""" + Ident + """(.*)""").r
  private val Modify = ("""(?is)modify\s+(?:column\s+)?""" + Ident + """\s+""" + Type + """(.*)""").r

  private val NotNullRe = """(?is).*\bnot\s+null\b.*""".r
  private val AfterRe = ("""(?is).*\bafter\s+""" + Ident + """.*""").r

  /** ADD/DROP words that open non-column subcommands — those statements
    * must be dropped as unparseable, not misread as a column named
    * `INDEX` (the reference's converter handles column ops only too). */
  private val NonColumnWords = Set(
    "index", "key", "primary", "unique", "constraint", "foreign",
    "fulltext", "spatial", "partition", "check")

  /** Backtick-stripped identifier — THE comparison form for column
    * names engine-wide (Consume's evolveSchema/renamesIn import this;
    * r13 meta-review: a second hand copy had already drifted on the
    * length guard). */
  private[graft] def bare(ident: String): String =
    if (ident.length >= 2 && ident.startsWith("`") && ident.endsWith("`"))
      ident.substring(1, ident.length - 1).replace("``", "`")
    else ident

  private def isColumnIdent(ident: String): Boolean =
    ident.startsWith("`") || !NonColumnWords.contains(ident.toLowerCase)

  /** The table part of a possibly schema-qualified name, backticks
    * stripped. The last IDENT, not the last dot-segment (r13 review): a
    * dot inside a backticked name is part of the name, and the old
    * split on dots mangled it into a name no TableSync matches — the
    * DDL then silently skipped schema evolution. */
  private def stripSchema(table: String): String =
    """(?:`([^`]+)`|([\w$]+))\s*$""".r.findFirstMatchIn(table)
      .map(m => Option(m.group(1)).getOrElse(m.group(2)))
      .getOrElse(table)

  /** [start, end] inclusive spans of every string literal in `s`,
    * honoring backslash escapes and ''-doubling (both forms MySQL
    * emits). An unterminated literal extends to the end of the string.
    * This ONE scanner replaces the four regex copies of the literal
    * grammar that kept drifting apart (r13 meta-review chain: comment
    * words inside DEFAULT literals, NOT NULL inside DEFAULT literals,
    * escaped quotes faking clause breaks — all the same blindness). */
  private def literalSpans(s: String): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '`' =>
          // a backtick-quoted IDENTIFIER is not a string literal — an
          // apostrophe inside one (`it's`) must not open a bogus
          // literal that blanks the rest of the statement (c5a6bb1
          // meta-review) — but its CONTENT must still blank out of the
          // keyword projections (b702589 meta-review: a column named
          // `x, add y` tripped the clause separator). Identifier spans
          // ride the same list; value-capture lookups only ever match
          // spans starting at a quote character, so they never collide.
          val start = i
          i += 1
          var closed = false
          while (i < s.length && !closed) {
            if (s.charAt(i) == '`') {
              if (i + 1 < s.length && s.charAt(i + 1) == '`') i += 2 // ``-doubled
              else closed = true
            } else i += 1
          }
          out += ((start, i)) // i == closing backtick, or s.length if unterminated
          i += 1
        case '\'' =>
          val start = i
          i += 1
          var done = false
          while (i < s.length && !done) {
            s.charAt(i) match {
              case '\\' => i += 2
              case '\'' if i + 1 < s.length && s.charAt(i + 1) == '\'' => i += 2
              case '\'' => done = true
              case _ => i += 1
            }
          }
          // end = index of the closing quote; an UNTERMINATED literal
          // gets a virtual close at s.length, so content substrings
          // (a+1 until b) and interior blanking stay uniform — the old
          // last-content-char end silently truncated the final char
          out += ((start, if (done) i else s.length))
          i += 1
        case _ => i += 1
      }
    }
    out.result()
  }

  /** `s` with every literal's CONTENT blanked to spaces (quotes kept):
    * same length, so a keyword matched in the blanked projection sits at
    * the same offset in the original — scans become literal-blind and
    * captures stay position-exact. Takes the spans so the one scan in
    * [[tail]] is shared, never recomputed. */
  private def blankLiterals(s: String, spans: Seq[(Int, Int)]): String = {
    val arr = s.toCharArray
    spans.foreach { case (a, b) =>
      var i = a + 1
      val end = math.min(b, s.length)
      while (i < end) { arr(i) = ' '; i += 1 }
    }
    new String(arr)
  }
  private def blankLiterals(s: String): String = blankLiterals(s, literalSpans(s))

  private val CommentKw = """(?is)\bcomment\s+'""".r
  private val DefaultKw = """(?is)\bdefault\s+""".r

  /** Keyword DEFAULT expressions, translated to valid ClickHouse: bare
    * NULL / CURRENT_TIMESTAMP pass verbatim, fractional-seconds forms
    * become now64(fsp), every other form (parenthesized zero-fsp,
    * now(), LOCALTIME/LOCALTIMESTAMP — none valid CH spellings; now()'s
    * argument there is a timezone) becomes now(). None = not a keyword
    * (the caller quotes it as a value). ONE function is both the gate
    * and the renderer, so the keyword list cannot drift. */
  private val NullKw = """(?i)null""".r
  private val KeywordFn =
    """(?i)(current_timestamp|now|localtime|localtimestamp)(\(\s*(\d*)\s*\))?""".r
  private def keywordDefault(b: String): Option[String] = b match {
    case NullKw() => Some(b)
    case KeywordFn(name, parens, fsp) =>
      val f = Option(fsp).filter(_.nonEmpty).flatMap(_.toIntOption).getOrElse(0)
      if (f > 0) Some(s"now64($f)")
      else if (parens == null && name.equalsIgnoreCase("current_timestamp")) Some(b)
      else Some("now()")
    case _ => None
  }

  private def tail(rest: String): (Boolean, Option[String], Option[String], Option[String]) = {
    val spans = literalSpans(rest)
    val blanked = blankLiterals(rest, spans)
    // COMMENT: keyword located in the blanked projection (a 'comment'
    // inside any literal is invisible there); the VALUE is the original
    // literal at that exact offset, inner escapes preserved
    val comment = CommentKw.findFirstMatchIn(blanked).map { m =>
      val q = m.end - 1
      val (a, b) = spans.find(_._1 == q).getOrElse((q, rest.length))
      rest.substring(a + 1, math.min(b, rest.length))
    }
    // DEFAULT, stored RENDER-READY: a quoted value keeps its escaped
    // inner text re-wrapped; a bare keyword expression translates via
    // keywordDefault; any other bare token is quoted like the reference
    // golden (`default 0` -> default '0', test_sql_convent.py:59) with
    // embedded quotes doubled (bit literal b'1')
    val default = DefaultKw.findFirstMatchIn(blanked).map { m =>
      val v = m.end
      if (v < rest.length && rest.charAt(v) == '\'') {
        val (a, b) = spans.find(_._1 == v).getOrElse((v, rest.length))
        s"'${rest.substring(a + 1, math.min(b, rest.length))}'"
      } else {
        // token from the ORIGINAL text (a bit literal b'1' embeds a
        // quote span the blanked projection hollows out); whitespace
        // still terminates it, matching the old \S+ capture
        val tok = rest.substring(v).takeWhile(!_.isWhitespace)
        keywordDefault(tok).getOrElse(s"'${tok.replace("'", "''")}'")
      }
    }
    val notNull = NotNullRe.matches(blanked)
    // AFTER position: locate in the blanked projection, CAPTURE from the
    // original at the same offsets (meta-review of 096ff58: the blanked
    // capture returned backticks around spaces for `my col`)
    val after = AfterRe.findFirstMatchIn(blanked).map(m =>
      rest.substring(m.start(1), m.end(1)))
    (notNull, default, comment, after)
  }

  def parse(sql: String): Option[ParsedAlter] = sql match {
    case Head(table, body) =>
      val t = stripSchema(table)
      body match {
        case _ if multiClause(body) =>
          // a multi-clause ALTER must be REFUSED whole, never half-parsed
          // (r13 review): matching only the first clause mis-read the
          // later clauses' constraints into the first column's tail
          // (NOT NULL bleed) and silently never created the later
          // columns — post-ALTER rows' values for them from_json-nulled
          // in state with no error anywhere. The reference half-parses
          // here too (convert.py takes alter_specification[0]); refusing
          // loudly (None -> log/park) is the same deliberate-divergence
          // class as the T3 dead-guard fix. Split multi-clause ALTERs
          // upstream into per-clause statements.
          None
        case Add(name, dt, rest) if isColumnIdent(name) =>
          val (nn, d, c, pos) = tail(rest)
          Some(ParsedAlter(t, AddColumn(name, dt, nn, d, c, pos)))
        case ChangeTyped(oldN, newN, dt, rest) if isColumnIdent(oldN) =>
          val (nn, d, c, _) = tail(rest)
          Some(ParsedAlter(t, ChangeColumn(oldN, newN, Some(dt), nn, d, c)))
        case Change(oldN, newN, _) if isColumnIdent(oldN) =>
          Some(ParsedAlter(t, ChangeColumn(oldN, newN)))
        case Modify(name, dt, rest) if isColumnIdent(name) =>
          val (nn, d, c, _) = tail(rest)
          Some(ParsedAlter(t, ModifyColumn(name, dt, nn, d, c)))
        case Drop(name) if isColumnIdent(name) =>
          Some(ParsedAlter(t, DropColumn(name)))
        case _ => None
      }
    case _ => None
  }

  // a top-level comma followed by another clause keyword, literal-blind
  // via the shared scanner (a comma inside DEFAULT 'a,b' or COMMENT
  // '...' is data; one inside DECIMAL(10,2) is followed by digits, not
  // a keyword, so it never matches)
  private val ClauseSep =
    """(?is),\s*(?:add|drop|change|modify|rename|alter)\b""".r
  private def multiClause(body: String): Boolean =
    ClauseSep.findFirstIn(blankLiterals(body)).isDefined

  /** Render the ClickHouse-dialect DDL for a parsed ALTER, matching the
    * reference goldens exactly (tests/test_sql_convent.py).
    */
  def toClickHouse(schema: String, sql: String): Option[(String, String)] =
    parse(sql).map { case ParsedAlter(table, action) =>
      val target = s"$schema.$table"
      val out = action match {
        case AddColumn(name, dt, notNull, default, comment, _) =>
          val tpe = TypeMap.render(dt, nullable = !notNull)
          // the reference renders ADD COLUMN defaults too
          // (convert.py:119-124) — without it the ClickHouse column is
          // created with the type default and existing rows silently
          // diverge from the source (r13 advisor, medium)
          val dft = default.map(x => s" default $x").getOrElse("")
          val cmt = comment.map(c => s" comment '$c'").getOrElse("")
          s"alter table $target add column $name $tpe$dft$cmt"
        case DropColumn(name) =>
          s"alter table $target drop column $name"
        case ChangeColumn(oldN, newN, dt, nn, d, c) if bare(oldN) == bare(newN) && dt.isDefined =>
          // same-name CHANGE is MySQL's idiomatic type change — a rename
          // rendering would be a no-op and silently drop the retype.
          // bare() comparison (r13 review): mixed quoting (`qty` vs qty)
          // is still the same column, and the restated NOT NULL is
          // honored like the MODIFY path instead of hardcoding Nullable
          val dft = d.map(x => s" default $x").getOrElse("")
          val cmt = c.map(x => s" comment '$x'").getOrElse("")
          s"alter table $target modify column $newN ${TypeMap.render(dt.get, nullable = !nn)}$dft$cmt"
        case ChangeColumn(oldN, newN, _, _, _, _) =>
          s"alter table $target rename column $oldN to $newN"
        case ModifyColumn(name, dt, notNull, default, comment) =>
          val tpe = TypeMap.render(dt, nullable = !notNull)
          val dft = default.map(d => s" default $d").getOrElse("")
          val cmt = comment.map(c => s" comment '$c'").getOrElse("")
          s"alter table $target modify column $name $tpe$dft$cmt"
      }
      (schema, out)
    }

  /** Spark-side schema evolution for the same ALTER against a Spark SQL
    * catalog table (the idiomatic sink of this engine). Returns the SQL to
    * run via `spark.sql`, or None for unparseable statements.
    */
  def toSparkSql(db: String, sql: String): Option[String] =
    parse(sql).map { case ParsedAlter(table, action) =>
      val target = s"$db.$table"
      action match {
        case AddColumn(name, dt, _, _, comment, _) =>
          val tpe = TypeMap.toSpark(dt).sql
          val cmt = comment.map(c => s" COMMENT '$c'").getOrElse("")
          s"ALTER TABLE $target ADD COLUMNS ($name $tpe$cmt)"
        case DropColumn(name) =>
          s"ALTER TABLE $target DROP COLUMN $name"
        case ChangeColumn(oldN, newN, dt, _, _, _) if bare(oldN) == bare(newN) && dt.isDefined =>
          s"ALTER TABLE $target ALTER COLUMN $newN TYPE ${TypeMap.toSpark(dt.get).sql}"
        case ChangeColumn(oldN, newN, _, _, _, _) =>
          // a rename that ALSO retypes renders the rename only — Spark SQL
          // has no single-statement form; the store-side evolution
          // (Consume.evolveSchema/liftSlice) applies the retype to state
          s"ALTER TABLE $target RENAME COLUMN $oldN TO $newN"
        case ModifyColumn(name, dt, _, _, _) =>
          s"ALTER TABLE $target ALTER COLUMN $name TYPE ${TypeMap.toSpark(dt).sql}"
      }
    }
}
