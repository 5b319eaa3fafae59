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
  private def isAsciiAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** g_ascii_isxdigit: ASCII hex digits only — Unicode decimal digits and
    * fullwidth A-F must NOT parse as hex (radix.c:345,475,565). */
  private def isAsciiXdigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def xdigitVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else c - 'A' + 10

  /** Input chars consumed matching `prefix` fully from `pos`, or -1.
    * An input '\r' immediately before an expected '\n' is skipped
    * (radix.c _find_matching_literal_prefix CRLF tolerance). */
  private def litMatch(s: String, pos: Int, prefix: String): Int = {
    var i = pos
    var r = 0
    while (r < prefix.length) {
      if (i < s.length && s.charAt(i) == '\r' && prefix.charAt(r) == '\n')
        i += 1
      if (i >= s.length || s.charAt(i) != prefix.charAt(r)) return -1
      i += 1; r += 1
    }
    i - pos
  }

  /** Returns chars consumed from `s.substring(pos)`, or -1 if no match. */
  def parserMatch(kind: String, param: String, s: String, pos: Int): Int = {
    val n = s.length
    kind match {
      case "NUMBER" =>
        // r_parser_number: 0x/0X hex, or '-' (no '+') + ASCII digits
        def d(k: Int): Char = if (pos + k < n) s.charAt(pos + k) else '\u0000'
        if (d(0) == '0' && (d(1) == 'x' || d(1) == 'X')) {
          var j = 2
          while (isAsciiXdigit(d(j))) j += 1
          if (j >= 3) j else -1
        } else {
          var j = 0
          if (d(0) == '-') j += 1
          val start = j
          while (d(j) >= '0' && d(j) <= '9') j += 1
          if (j > start) j else -1
        }
      case "FLOAT" | "DOUBLE" =>
        // r_parser_float, quirks preserved: '-' only (no '+'), ONE dot
        // anywhere (leading ok), optional e/E exponent with optional
        // '-' (a bare trailing 'e' still consumes), a lone '-' matches
        def d(k: Int): Char = if (pos + k < n) s.charAt(pos + k) else '\u0000'
        var j = 0
        var dot = false
        if (d(0) == '-') j += 1
        var cont = true
        while (cont) {
          val c = d(j)
          if (c >= '0' && c <= '9') j += 1
          else if (!dot && c == '.') { dot = true; j += 1 }
          else cont = false
        }
        if (j > 0 && (d(j) == 'e' || d(j) == 'E')) {
          j += 1
          if (d(j) == '-') j += 1
          while (d(j) >= '0' && d(j) <= '9') j += 1
        }
        if (j > 0) j else -1
      case "STRING" =>
        // r_parser_string: param chars are EXTRA ALLOWED characters on
        // top of alnum (an allow-list), NOT delimiters
        var j = pos
        while (j < n && (isAsciiAlnum(s.charAt(j)) ||
            param.indexOf(s.charAt(j)) >= 0)) j += 1
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
          // g_ascii_isdigit — a Unicode digit must NOT parse as an octet
          if (c >= '0' && c <= '9' && digits < 3) { v = v * 10 + (c - '0'); digits += 1; j += 1; if (v > 255) ok = false }
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
          } else if (isAsciiXdigit(c)) {
            octet = (if (octet == -1) 0 else octet * digit) + xdigitVal(c)
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
      case "MACADDR" | "LLADDR" =>
        // _r_parser_lladdr: up to `parts` colon-joined hex pairs, a
        // partial run keeps whole pairs (the dangling ':' unconsumes);
        // MACADDR = lladdr(17, 6)
        // r_parser_lladdr:384 parses the leading ASCII-digit prefix of
        // param ("6x" -> 6 parts; a digit-less param -> 0 parts, which
        // never matches); 20 only when the param is absent
        val parts =
          if (kind == "MACADDR") 6
          else if (param.isEmpty) 20
          else {
            var k = 0; var p = 0
            while (k < param.length && param.charAt(k) >= '0' &&
                param.charAt(k) <= '9') { p = p * 10 + (param.charAt(k) - '0'); k += 1 }
            p
          }
        val count = parts * 3 - 1
        def hex(k: Int): Boolean =
          pos + k < n && isAsciiXdigit(s.charAt(pos + k))
        var len = 0
        var i = 1
        var break = false; var failed = false
        while (!break && !failed && i <= parts) {
          if (!hex(len) || !hex(len + 1)) {
            if (i > 1) { len -= 1; break = true } else failed = true
          } else if (i == parts) { len += 2; i += 1 }
          else if (pos + len + 2 >= n || s.charAt(pos + len + 2) != ':') {
            len += 2; break = true
          } else { len += 3; i += 1 }
        }
        if (failed || len > count) -1 else len
      case "EMAIL" =>
        // r_parser_email: optional leading param-char strip, local part
        // of alnum + specials (no leading/trailing '.'), '@', then the
        // permissive >=2-label hostname scan, trailing param-char strip
        // (the CAPTURE excludes the stripped brackets — find() trims)
        val specials = "!#$%&'*+-/=?^_`{|}~."
        def d(k: Int): Char = if (pos + k < n) s.charAt(pos + k) else '\u0000'
        var j = 0
        while (param.nonEmpty && param.indexOf(d(j)) >= 0 && d(j) != '\u0000') j += 1
        if (d(j) == '.') -1
        else {
          val localStart = j
          while (isAsciiAlnum(d(j)) || specials.indexOf(d(j)) >= 0) j += 1
          // r_parser_email:280 accepts an empty local part ("@a.b"
          // matches) — only the '@' itself is required
          if (j > localStart && d(j - 1) == '.') -1
          else if (d(j) != '@') -1
          else {
            j += 1
            var count = 0
            while (isAsciiAlnum(d(j)) || d(j) == '-') {
              j += 1; count += 1
              while (isAsciiAlnum(d(j)) || d(j) == '-') j += 1
              if (d(j) == '.') j += 1
            }
            if (count < 2) -1
            else {
              while (param.nonEmpty && param.indexOf(d(j)) >= 0 &&
                d(j) != '\u0000') j += 1
              if (j > 0) j else -1
            }
          }
        }
      case "HOSTNAME" =>
        // r_parser_hostname: alnum/'-' labels joined by '.', at least
        // two labels
        def d(k: Int): Char = if (pos + k < n) s.charAt(pos + k) else '\u0000'
        var j = 0
        var count = 0
        while (isAsciiAlnum(d(j)) || d(j) == '-') {
          j += 1; count += 1
          while (isAsciiAlnum(d(j)) || d(j) == '-') j += 1
          if (d(j) == '.') j += 1
        }
        if (count < 2) -1 else j
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
          // CRLF tolerance (radix.c _find_matching_literal_prefix /
          // _find_child_by_remaining_key): an input CR immediately
          // before an LF the literal expects is skipped
          val c0 = s.charAt(pos)
          val lookup = if (c0 == '\r' && pos + 1 < s.length &&
            s.charAt(pos + 1) == '\n') '\n' else c0
          node.litChildren.get(lookup) match {
            case Some(child) =>
              val consumed = litMatch(s, pos, child.prefix)
              if (consumed >= 0) rec(child, pos + consumed, caps)
            case _ =>
          }
        }
        node.parserChildren.foreach { case (p, child) =>
          if (complete == null) {
            val consumed = parserMatch(p.kind, p.param, s, pos)
            if (consumed >= 0) {
              val value = p.kind match {
                case "QSTRING" if consumed >= 2 => s.substring(pos + 1, pos + consumed - 1)
                case "EMAIL" if p.param.nonEmpty =>
                  // the stripped bracket chars are consumed but NOT part
                  // of the capture (r_parser_email match->ofs/len)
                  var b = pos; var e = pos + consumed
                  while (b < e && p.param.indexOf(s.charAt(b)) >= 0) b += 1
                  while (e > b && p.param.indexOf(s.charAt(e - 1)) >= 0) e -= 1
                  s.substring(b, e)
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
