package graft.patterndb

import scala.collection.mutable

/** patterndb pattern matching: a radix tree over literal prefixes with
  * typed parser edges and backtracking.
  *
  * Behavioral reference: `/root/reference/modules/dbparser/radix.c`
  * (≈1.3k LoC) — pattern text contains `@PARSER:name@` or
  * `@PARSER:name:param@` tokens between literals (parser node types
  * `radix.h:35-52`, param parsing `radix.c:605-760`); `@@` is a literal
  * `@`. Matching prefers literal edges over parser edges and backtracks;
  * the radix sharing of literal prefixes is what makes 10k-rule
  * databases O(line length) instead of O(rules) — that property is
  * preserved here.
  *
  * The tree is built once on the driver, shipped to executors inside the
  * expression (see [[graft.functions.RadixMatch]]), and probed per row.
  */
object Radix {

  // ---- pattern AST -------------------------------------------------------
  sealed trait Tok
  final case class LitTok(s: String) extends Tok
  final case class ParserTok(kind: String, name: String, param: String) extends Tok

  /** Split a pattern into literal / parser tokens (`radix.c:605-760`). */
  def tokenize(pattern: String): Seq[Tok] = {
    val out = mutable.ArrayBuffer[Tok]()
    val lit = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '@') {
        if (i + 1 < pattern.length && pattern.charAt(i + 1) == '@') {
          lit.append('@'); i += 2
        } else {
          val close = pattern.indexOf('@', i + 1)
          require(close > 0, s"unclosed @PARSER@ in pattern: $pattern")
          if (lit.nonEmpty) { out += LitTok(lit.toString); lit.clear() }
          val parts = pattern.substring(i + 1, close).split(":", 3)
          out += ParserTok(parts(0),
            if (parts.length > 1) parts(1) else "",
            if (parts.length > 2) parts(2) else "")
          i = close + 1
        }
      } else { lit.append(c); i += 1 }
    }
    if (lit.nonEmpty) out += LitTok(lit.toString)
    out.toSeq
  }

  // ---- typed parsers (radix.h:35-52) --------------------------------------
  /** Returns chars consumed from `s.substring(pos)`, or -1 if no match. */
  def parserMatch(kind: String, param: String, s: String, pos: Int): Int = {
    val n = s.length
    kind match {
      case "NUMBER" =>
        var i = pos
        if (i < n && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
        // hex support like the reference
        if (i + 1 < n && s.charAt(i) == '0' && (s.charAt(i + 1) == 'x' || s.charAt(i + 1) == 'X')) {
          var j = i + 2
          while (j < n && Character.digit(s.charAt(j), 16) >= 0) j += 1
          if (j > i + 2) j - pos else -1
        } else {
          var j = i
          while (j < n && s.charAt(j).isDigit) j += 1
          if (j > i) j - pos else -1
        }
      case "FLOAT" | "DOUBLE" =>
        var j = pos
        if (j < n && (s.charAt(j) == '-' || s.charAt(j) == '+')) j += 1
        val digitsStart = j
        while (j < n && s.charAt(j).isDigit) j += 1
        if (j < n && s.charAt(j) == '.') { j += 1; while (j < n && s.charAt(j).isDigit) j += 1 }
        if (j > digitsStart) j - pos else -1
      case "STRING" =>
        // delimited by space by default; param = extra delimiters
        val delims = if (param.nonEmpty) param + " " else " "
        var j = pos
        while (j < n && delims.indexOf(s.charAt(j)) < 0) j += 1
        if (j > pos) j - pos else -1
      case "ESTRING" =>
        // match up to (not incl.) the param delimiter string; param empty -> to end
        if (param.isEmpty) n - pos
        else {
          val at = s.indexOf(param, pos)
          if (at < 0) -1 else at - pos
        }
      case "QSTRING" =>
        // param = quote pair, e.g. '' or <> (first char opens, last closes)
        val (open, close) =
          if (param.length >= 2) (param.charAt(0), param.charAt(param.length - 1))
          else if (param.length == 1) (param.charAt(0), param.charAt(0))
          else ('"', '"')
        if (pos >= n || s.charAt(pos) != open) -1
        else {
          val end = s.indexOf(close, pos + 1)
          if (end < 0) -1 else end + 1 - pos
        }
      case "IPv4" =>
        var j = pos; var octets = 0; var digits = 0; var v = 0
        var ok = true
        while (j < n && ok) {
          val c = s.charAt(j)
          if (c.isDigit && digits < 3) { v = v * 10 + (c - '0'); digits += 1; j += 1; if (v > 255) ok = false }
          else if (c == '.' && digits > 0 && octets < 3) { octets += 1; digits = 0; v = 0; j += 1 }
          else ok = false
          if (!ok && digits == 0) j -= 1 // unconsume trailing dot
        }
        if (octets == 3 && digits > 0) j - pos else -1
      case "IPv6" =>
        // faithful r_parser_ipv6 state machine (radix.c): group-value
        // tracking, one '::' shortening max (a second '::' is a hard
        // fail), optional embedded IPv4 tail, trailing ':'/'.'
        // unconsume, and the closed-form validity check
        var len = 0
        var colons = 0; var dots = 0
        var octet = 0; var digit = 16
        var shortened = false
        var break = false; var failed = false
        while (!break && !failed && pos + len < n) {
          val c = s.charAt(pos + len)
          if (c == ':') {
            if (octet > 0xffff || (octet == -1 && shortened)) failed = true
            else if (colons == 7 || dots == 3) break = true
            else if (digit == 10) failed = true
            else {
              if (octet == -1) shortened = true
              colons += 1; octet = -1
            }
          } else if (Character.digit(c, 16) >= 0) {
            octet = (if (octet == -1) 0 else octet * digit) +
              Character.digit(c, 16)
          } else if (c == '.') {
            if (digit == 10 && octet > 255) failed = true
            else if ((digit == 16 && octet > 597) || octet == -1 ||
                colons == 7 || dots == 3) break = true
            else { dots += 1; octet = -1; digit = 10 }
          } else break = true
          if (!break && !failed) len += 1
        }
        if (failed) -1
        else {
          if (len > 0 && s.charAt(pos + len - 1) == '.') { len -= 1; dots -= 1 }
          else if (len > 1 && s.charAt(pos + len - 1) == ':' &&
              s.charAt(pos + len - 2) != ':') { len -= 1; colons -= 1 }
          val invalid = colons < 2 || colons > 7 ||
            (digit == 10 && octet > 255) || (digit == 16 && octet > 0xffff) ||
            !(dots == 0 || dots == 3) ||
            (!shortened && colons < 7 && dots == 0)
          if (invalid) -1 else len
        }
      case "IPvANY" =>
        val v4 = parserMatch("IPv4", param, s, pos)
        if (v4 > 0) v4 else parserMatch("IPv6", param, s, pos)
      case "MACADDR" =>
        val re = "^([0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}"
        val m = java.util.regex.Pattern.compile(re).matcher(s.substring(pos))
        if (m.find() && m.start() == 0) m.end() else -1
      case "EMAIL" =>
        val delims = if (param.nonEmpty) param else ""
        var j = pos
        // optional surrounding delimiter chars are stripped by caller pattern
        val re = "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
        val m = java.util.regex.Pattern.compile(re).matcher(s.substring(pos))
        if (m.find() && m.start() == 0) m.end() else -1
      case "HOSTNAME" =>
        val re = "^[a-zA-Z0-9][a-zA-Z0-9_.-]*"
        val m = java.util.regex.Pattern.compile(re).matcher(s.substring(pos))
        if (m.find() && m.start() == 0) m.end() else -1
      case "SET" =>
        // a character-CLASS run (radix.c r_parser_set strspn loop):
        // consume every char contained in param, at least one
        var j = pos
        while (j < n && param.indexOf(s.charAt(j)) >= 0) j += 1
        if (j > pos) j - pos else -1
      case "OPTIONALSET" =>
        val r = parserMatch("SET", param, s, pos)
        if (r < 0) 0 else r
      case "PCRE" =>
        val m = java.util.regex.Pattern.compile(param).matcher(s)
        m.region(pos, n)
        if (m.lookingAt()) m.end() - pos else -1
      case "ANYSTRING" => n - pos
      case "NLSTRING" =>
        // up to the next LF, CR dropped; FAILS with no newline ahead
        // (radix.c:94-109 r_parser_nlstring)
        val nl = s.indexOf('\n', pos)
        if (nl < 0) -1
        else if (nl > pos && s.charAt(nl - 1) == '\r') nl - 1 - pos
        else nl - pos
      case other =>
        throw new IllegalArgumentException(s"unknown @$other@ parser")
    }
  }

  // ---- radix tree ----------------------------------------------------------
  final class Node extends Serializable {
    var prefix: String = ""
    var litChildren: mutable.TreeMap[Char, Node] = mutable.TreeMap.empty
    var parserChildren: mutable.ArrayBuffer[(ParserTok, Node)] = mutable.ArrayBuffer.empty
    var rule: Rule = _
  }

  final case class Rule(ruleId: String, ruleClass: String,
      tags: Seq[String] = Nil) extends Serializable

  final class Tree extends Serializable {
    val root = new Node

    def insert(pattern: String, rule: Rule): Unit =
      insertToks(root, tokenize(pattern).toList, rule)

    private def insertToks(node: Node, toks: List[Tok], rule: Rule): Unit =
      toks match {
        case Nil =>
          node.rule = rule
        case LitTok(s) :: rest => insertLit(node, s, rest, rule)
        case (p: ParserTok) :: rest =>
          node.parserChildren.find(_._1 == p) match {
            case Some((_, child)) => insertToks(child, rest, rule)
            case None =>
              val child = new Node
              node.parserChildren += ((p, child))
              insertToks(child, rest, rule)
          }
      }

    private def insertLit(node: Node, s: String, rest: List[Tok], rule: Rule): Unit = {
      if (s.isEmpty) { insertToks(node, rest, rule); return }
      node.litChildren.get(s.charAt(0)) match {
        case None =>
          val child = new Node
          child.prefix = s
          node.litChildren(s.charAt(0)) = child
          insertToks(child, rest, rule)
        case Some(child) =>
          val common = commonPrefixLen(child.prefix, s)
          if (common == child.prefix.length) {
            insertLit2(child, s.substring(common), rest, rule)
          } else {
            // split child at `common` (the radix split)
            val mid = new Node
            mid.prefix = child.prefix.substring(0, common)
            child.prefix = child.prefix.substring(common)
            mid.litChildren(child.prefix.charAt(0)) = child
            node.litChildren(mid.prefix.charAt(0)) = mid
            insertLit2(mid, s.substring(common), rest, rule)
          }
      }
    }

    /** insert remainder of a literal at a node whose prefix fully matched */
    private def insertLit2(node: Node, s: String, rest: List[Tok], rule: Rule): Unit =
      if (s.isEmpty) insertToks(node, rest, rule)
      else insertLit(node, s, rest, rule)

    private def commonPrefixLen(a: String, b: String): Int = {
      var i = 0
      val m = math.min(a.length, b.length)
      while (i < m && a.charAt(i) == b.charAt(i)) i += 1
      i
    }

    /** Longest match with backtracking; literal edges beat parser edges
      * (radix.c match order). A COMPLETE match (input fully consumed at
      * a rule node) wins; failing that, the first rule node reached in
      * DFS post-order with input LEFT OVER is accepted — radix.c
      * `_find_node_with_state` retries with `require_complete_match`
      * off when only a partial match was found, so `@DOUBLE:TEST@`
      * matches "1234ab" (test_parsers_e2e.c). Returns (rule, captures)
      * or null. */
    def find(s: String): (Rule, List[(String, String)]) = {
      var complete: (Rule, List[(String, String)]) = null
      var partial: (Rule, List[(String, String)]) = null

      def rec(node: Node, pos: Int, caps: List[(String, String)]): Unit = {
        if (complete != null) return
        if (node.rule != null && pos == s.length) {
          complete = (node.rule, caps.reverse); return
        }
        if (pos < s.length) {
          node.litChildren.get(s.charAt(pos)) match {
            case Some(child) if s.startsWith(child.prefix, pos) =>
              rec(child, pos + child.prefix.length, caps)
            case _ =>
          }
        }
        node.parserChildren.foreach { case (p, child) =>
          if (complete == null) {
            val consumed = parserMatch(p.kind, p.param, s, pos)
            if (consumed >= 0) {
              val value = p.kind match {
                case "QSTRING" if consumed >= 2 => s.substring(pos + 1, pos + consumed - 1)
                case _ => s.substring(pos, pos + consumed)
              }
              val caps2 = if (p.name.nonEmpty) (p.name, value) :: caps else caps
              // ESTRING stops BEFORE the delimiter; consume it on the way out
              val skip = if (p.kind == "ESTRING" && p.param.nonEmpty) p.param.length else 0
              rec(child, pos + consumed + skip, caps2)
            }
          }
        }
        // post-order: the reference's relaxed pass returns the first
        // rule node (children tried and failed) with input remaining
        if (complete == null && partial == null && node.rule != null &&
            pos < s.length)
          partial = (node.rule, caps.reverse)
      }

      rec(root, 0, Nil)
      if (complete != null) complete else partial
    }
  }

  /** Build a tree from (ruleId, ruleClass, pattern) triples. */
  def build(rules: Seq[(String, String, String)]): Tree = {
    val t = new Tree
    rules.foreach { case (id, cls, pattern) => t.insert(pattern, Rule(id, cls)) }
    t
  }
}
