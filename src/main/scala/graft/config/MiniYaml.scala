package graft.config

/** Dependency-free parser for the YAML subset the reference's `synch.yaml`
  * actually uses (/root/reference/synch.yaml): nested maps by indentation,
  * block lists of scalars and of maps, quoted/plain scalars, `# comments`,
  * empty values. Deliberately NOT a general YAML implementation — no
  * anchors, flow collections, multi-line scalars, or type tags; the build
  * has zero external dependencies, and config files are the one place a
  * hand-rolled parser is both small and fully testable.
  */
object MiniYaml {

  sealed trait Node {
    def get(key: String): Option[Node] = this match {
      case YMap(e) => e.collectFirst { case (k, v) if k == key => v }
      case _ => None
    }
    def items: Seq[Node] = this match {
      case YList(xs) => xs
      case _ => Nil
    }
    def scalar: Option[String] = this match {
      case YScalar(v) => v
      case _ => None
    }
    def str(key: String, default: String = ""): String =
      get(key).flatMap(_.scalar).getOrElse(default)
    def int(key: String, default: Int): Int =
      get(key).flatMap(_.scalar).map(_.toInt).getOrElse(default)
    def long(key: String, default: Long): Long =
      get(key).flatMap(_.scalar).map(_.toLong).getOrElse(default)
    /** YAML-1.1 booleans, the set PyYAML (the reference's loader) accepts:
      * a reference user's existing `monitoring: yes` must parse. */
    def bool(key: String, default: Boolean): Boolean =
      get(key).flatMap(_.scalar).map(_.toLowerCase match {
        case "true" | "yes" | "on" | "1" => true
        case "false" | "no" | "off" | "0" => false
        case other => throw new IllegalArgumentException(
          s"key '$key': not a boolean: '$other'")
      }).getOrElse(default)
    def strings(key: String): Seq[String] =
      get(key).map(_.items.flatMap(_.scalar)).getOrElse(Nil)
  }
  /** Entries keep document order (lists of sources/tables are ordered). */
  final case class YMap(entries: Seq[(String, Node)]) extends Node
  final case class YList(xs: Seq[Node]) extends Node
  final case class YScalar(value: Option[String]) extends Node

  private final case class Line(indent: Int, text: String)

  def parse(text: String): Node = {
    val lines = text.linesIterator
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .map { raw =>
        val indent = raw.takeWhile(_ == ' ').length
        // YAML forbids tabs in indentation; silently counting them as
        // zero-width would re-parent the line and drop config keys
        if (indent < raw.length && raw.charAt(indent) == '\t')
          throw new IllegalArgumentException(
            s"tab in indentation (YAML requires spaces): '${raw.trim}'")
        Line(indent, raw.trim)
      }
      .toVector
    if (lines.isEmpty) YScalar(None) else parseBlock(lines)
  }

  /** The ONE boundary-aware quote scanner (r13 meta-review: two
    * hand-copied scanners drifted once already — mapKeySplit missed the
    * boundary rule stripComment had). A quote OPENS a string only at a
    * value boundary (start of line, or after space/colon/comma/dash) —
    * an apostrophe inside an unquoted scalar (`bob's`) is data, not a
    * delimiter. Returns the first UNQUOTED index where `hit` is true. */
  private def firstUnquoted(text: String)(hit: Int => Boolean): Int = {
    var inS = false; var inD = false
    def boundary(i: Int): Boolean =
      i == 0 || " :,-".contains(text.charAt(i - 1))
    var i = 0
    while (i < text.length) {
      text.charAt(i) match {
        case '\'' if !inD => if (inS) inS = false else if (boundary(i)) inS = true
        case '"' if !inS => if (inD) inD = false else if (boundary(i)) inD = true
        case _ if !inS && !inD && hit(i) => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Drop a ` # comment` tail (quote-aware) and full-line comments. */
  private def stripComment(raw: String): String = {
    val i = firstUnquoted(raw)(j =>
      raw.charAt(j) == '#' && (j == 0 || raw.charAt(j - 1).isWhitespace))
    if (i < 0) raw else raw.substring(0, i)
  }

  private def parseBlock(lines: Vector[Line]): Node =
    if (lines.head.text.startsWith("-")) parseList(lines) else parseMap(lines)

  /** A line opens a mapping iff it has a `key:` head (colon followed by
    * space or end-of-line). Bare scalars like `127.0.0.1:5000` do not.
    * Shares [[firstUnquoted]]'s scanner, so key splitting and comment
    * stripping can never disagree on where a string ends. */
  private def mapKeySplit(text: String): Option[(String, String)] = {
    val i = firstUnquoted(text)(j => text.charAt(j) == ':' &&
      (j == text.length - 1 || text.charAt(j + 1) == ' '))
    if (i < 0) None
    else Some((text.substring(0, i).trim, text.substring(i + 1).trim))
  }

  private def cleanScalar(s: String): YScalar = {
    val t = s.trim
    if (t.isEmpty || t == "null" || t == "~") YScalar(None)
    else if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
      (t.head == '\'' && t.last == '\''))) YScalar(Some(t.substring(1, t.length - 1)))
    else YScalar(Some(t))
  }

  private def parseList(lines: Vector[Line]): YList = {
    val base = lines.head.indent
    lines.find(_.indent < base).foreach(l =>
      throw new IllegalArgumentException(
        s"misaligned indentation (${l.indent} < block indent $base): '${l.text}'"))
    // group: each item starts at a base-indent dash line
    val starts = lines.zipWithIndex.collect {
      case (Line(i, t), idx) if i == base && t.startsWith("-") => idx
    }
    val items = starts.zipWithIndex.map { case (s, k) =>
      val end = if (k + 1 < starts.length) starts(k + 1) else lines.length
      val head = lines(s)
      val rest = head.text.drop(1).trim
      val tail = lines.slice(s + 1, end)
      if (rest.isEmpty) {
        if (tail.isEmpty) YScalar(None) else parseBlock(tail)
      } else if (mapKeySplit(rest).isDefined) {
        // the synthesized first line sits at the REAL column of its first
        // key ("-  key:" with extra padding sets the item's indent), so
        // sibling keys on following lines group with it
        val pad = head.text.drop(1).takeWhile(_ == ' ').length
        parseBlock(Line(base + 1 + pad, rest) +: tail)
      } else cleanScalar(rest)
    }
    YList(items)
  }

  private def parseMap(lines: Vector[Line]): YMap = {
    val base = lines.head.indent
    // a line OUTDENTED below this block's head is aligned with no open
    // block: PyYAML rejects it, and silently re-parenting it under the
    // previous entry (then dropping it there) loses config keys
    lines.find(_.indent < base).foreach(l =>
      throw new IllegalArgumentException(
        s"misaligned indentation (${l.indent} < block indent $base): '${l.text}'"))
    // dash lines at the parent key's own indent (zero-indent list style,
    // which PyYAML accepts) belong to the preceding key's value, not to
    // the map — only non-dash lines open entries
    val starts = lines.zipWithIndex.collect {
      case (Line(i, t), idx) if i == base && !t.startsWith("-") => idx
    }
    val entries = starts.zipWithIndex.map { case (s, k) =>
      val end = if (k + 1 < starts.length) starts(k + 1) else lines.length
      val (key, value) = mapKeySplit(lines(s).text).getOrElse(
        throw new IllegalArgumentException(s"not a mapping line: '${lines(s).text}'"))
      val children = lines.slice(s + 1, end)
      // `key: scalar` followed by a deeper block is invalid YAML — erroring
      // beats silently discarding the block
      if (value.nonEmpty && children.nonEmpty)
        throw new IllegalArgumentException(
          s"key '$key' has both a scalar value and an indented block")
      val node =
        if (value.nonEmpty) cleanScalar(value)
        else if (children.nonEmpty) parseBlock(children)
        else YScalar(None)
      key -> node
    }
    YMap(entries)
  }
}
