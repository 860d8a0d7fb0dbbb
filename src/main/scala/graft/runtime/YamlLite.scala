package graft.runtime

import scala.collection.mutable

/** Minimal YAML-subset parser for service configs (zero-dependency — the
  * build allows no libraries beyond Spark). Supports exactly the subset the
  * reference's configs use (res/dsp.yaml:1-29, res/dsp-k2k.yaml:1-32):
  * nested maps by 2-space indentation, block lists (`- ` items, scalar or
  * map), inline flow maps `{k: v, ...}` and lists `[a, b]`, scalars
  * (string/int/bool), `#` comments, quoted strings.
  *
  * Result model: Map[String, Any] / List[Any] / String — typed accessors on
  * [[YamlLite.Node]].
  */
object YamlLite {

  final case class Node(value: Any) {
    def apply(path: String): Node = {
      path.split('.').foldLeft(this) { (n, key) =>
        n.value match {
          case m: Map[_, _] =>
            Node(m.asInstanceOf[Map[String, Any]].getOrElse(key, throw new NoSuchElementException(s"missing key '$key' in path '$path'")))
          case other => throw new IllegalArgumentException(s"'$key' lookup on non-map $other")
        }
      }
    }
    def get(path: String): Option[Node] =
      try Some(apply(path))
      catch { case _: NoSuchElementException => None }
    def str: String = value.toString
    def int: Int = str.toInt
    def long: Long = str.toLong
    def bool: Boolean = str.toBoolean
    def list: Seq[Node] = value.asInstanceOf[Seq[Any]].map(Node(_))
    def map: Map[String, Node] =
      value.asInstanceOf[Map[String, Any]].map { case (k, v) => k -> Node(v) }
  }

  def parse(text: String): Node = {
    val lines = text
      .split('\n')
      .map(stripComment)
      .zipWithIndex
      .filter { case (l, _) => l.trim.nonEmpty }
      .toList
    val (node, rest) = parseBlock(lines, indentOf(lines.head._1))
    require(rest.isEmpty, s"trailing config at line ${rest.headOption.map(_._2 + 1).getOrElse(0)}")
    Node(node)
  }

  private def stripComment(l: String): String = {
    // strip unquoted # comments
    var inS = false; var inD = false
    val sb = new StringBuilder
    var i = 0
    var done = false
    while (i < l.length && !done) {
      val c = l(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      if (c == '#' && !inS && !inD) done = true else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  private type Lines = List[(String, Int)]

  /** Parse a block (map or list) at exactly `indent`. */
  private def parseBlock(lines: Lines, indent: Int): (Any, Lines) = {
    if (lines.isEmpty) (Map.empty[String, Any], lines)
    else if (lines.head._1.trim.startsWith("- ") || lines.head._1.trim == "-")
      parseList(lines, indent)
    else parseMap(lines, indent)
  }

  private def parseMap(lines0: Lines, indent: Int): (Map[String, Any], Lines) = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    var lines = lines0
    var continue = true
    while (continue && lines.nonEmpty) {
      val (line, ln) = lines.head
      val ind = indentOf(line)
      if (ind != indent) { continue = false }
      else {
        val t = line.trim
        val colon = t.indexOf(':')
        require(colon > 0, s"expected 'key: value' at line ${ln + 1}: '$t'")
        val key = t.take(colon).trim
        val rhs = t.drop(colon + 1).trim
        lines = lines.tail
        if (rhs.nonEmpty) out(key) = scalarOrFlow(rhs)
        else {
          // nested block (or empty); list items may sit at the KEY's own
          // indentation — the other standard YAML block-list style
          // ("rules:\n- name: hb"), which yamllint accepts and /reload
          // configs commonly use
          lines.headOption match {
            case Some((nl, _)) if indentOf(nl) > indent =>
              val (v, rest) = parseBlock(lines, indentOf(nl))
              out(key) = v
              lines = rest
            case Some((nl, _))
                if indentOf(nl) == indent && {
                  val t2 = nl.trim; t2.startsWith("- ") || t2 == "-"
                } =>
              val (v, rest) = parseList(lines, indent)
              out(key) = v
              lines = rest
            case _ => out(key) = Map.empty[String, Any]
          }
        }
      }
    }
    (out.toMap, lines)
  }

  private def parseList(lines0: Lines, indent: Int): (Seq[Any], Lines) = {
    val out = mutable.ArrayBuffer.empty[Any]
    var lines = lines0
    var continue = true
    while (continue && lines.nonEmpty) {
      val (line, _) = lines.head
      val ind = indentOf(line)
      val t = line.trim
      if (ind != indent || !(t.startsWith("- ") || t == "-")) continue = false
      else {
        val rhs = t.drop(1).trim
        lines = lines.tail
        if (rhs.isEmpty) {
          // nested block item
          val (v, rest) = parseBlock(lines, indentOf(lines.head._1))
          out += v
          lines = rest
        } else if (rhs.startsWith("{") || rhs.startsWith("[")) {
          out += scalarOrFlow(rhs)
        } else if (rhs.contains(": ") || rhs.endsWith(":")) {
          // map item: first entry inline after `- `, siblings at indent+2
          val itemIndent = ind + 2
          val synthetic = ((" " * itemIndent) + rhs, -1)
          val body = lines.takeWhile { case (l, _) => indentOf(l) >= itemIndent }
          lines = lines.drop(body.length)
          val (v, rest) = parseMap(synthetic :: body, itemIndent)
          require(rest.isEmpty, s"malformed list item near: '$rhs'")
          out += v
        } else out += scalarOrFlow(rhs)
      }
    }
    (out.toSeq, lines)
  }

  private def scalarOrFlow(s: String): Any = s match {
    case f if f.startsWith("{") && f.endsWith("}") =>
      val inner = f.substring(1, f.length - 1).trim
      if (inner.isEmpty) Map.empty[String, Any]
      else
        splitFlow(inner).map { kv =>
          val c = kv.indexOf(':')
          kv.take(c).trim -> scalarOrFlow(kv.drop(c + 1).trim)
        }.toMap
    case f if f.startsWith("[") && f.endsWith("]") =>
      val inner = f.substring(1, f.length - 1).trim
      if (inner.isEmpty) Seq.empty[Any] else splitFlow(inner).map(v => scalarOrFlow(v.trim))
    case q if q.length >= 2 && ((q.head == '"' && q.last == '"') || (q.head == '\'' && q.last == '\'')) =>
      q.substring(1, q.length - 1)
    case other => other
  }

  private def splitFlow(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var depth = 0
    val sb = new StringBuilder
    s.foreach {
      case c @ ('{' | '[') => depth += 1; sb.append(c)
      case c @ ('}' | ']') => depth -= 1; sb.append(c)
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case c => sb.append(c)
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }
}
