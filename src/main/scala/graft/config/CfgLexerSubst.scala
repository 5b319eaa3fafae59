package graft.config

/** Backtick substitution in config text — a clean-room port of
  * `/root/reference/lib/cfg-lexer-subst.c`.
  *
  * `` `name` `` references resolve in the reference's order — use-site
  * args, then block-parameter defaults, then `@define` globals, then
  * the process environment (`_lookup_value`, cfg-lexer-subst.c:51-68)
  * — with `` `` `` (an empty reference) inserting one literal
  * backtick. The scanner tracks string state so a value that is itself
  * a complete quoted string splices into a surrounding "string" or
  * 'qstring' WITHOUT its quotes, re-encoded for the enclosing quote
  * kind; a non-string value (or one followed by more tokens) inserts
  * verbatim. Error cases carry the reference's exact messages
  * (including its "subsitute" typo).
  *
  * Key normalization: `-` and `_` interchange in reference names
  * (cfg-args.c cfg_args_normalize_key); environment lookups use the
  * raw spelling.
  */
object CfgLexerSubst {

  final class SubstError(msg: String) extends RuntimeException(msg)

  private def normalize(k: String): String = k.replace('-', '_')

  /** Build the resolver from the three scope maps + env. */
  def resolver(args: Map[String, String], defs: Map[String, String],
      globals: Map[String, String]): String => Option[String] = {
    val a = args.map { case (k, v) => normalize(k) -> v }
    val d = defs.map { case (k, v) => normalize(k) -> v }
    val g = globals.map { case (k, v) => normalize(k) -> v }
    name => {
      val n = normalize(name)
      a.get(n).orElse(d.get(n)).orElse(g.get(n))
        .orElse(sys.env.get(name))
    }
  }

  // string-tracking states (cfg-lexer-subst.c:32-39)
  private final val NotString = 0
  private final val WithinString = 1
  private final val WithinStringQuote = 2
  private final val WithinStringQuotedChar = 3
  private final val WithinQString = 4

  private def trackStringState(last: Int, c: Char): Int = last match {
    case NotString =>
      if (c == '"') WithinString
      else if (c == '\'') WithinQString
      else NotString
    case WithinString | WithinStringQuotedChar =>
      if (c == '\\') WithinStringQuote
      else if (c == '"') NotString
      else WithinString
    case WithinStringQuote => WithinStringQuotedChar
    case WithinQString =>
      if (c == '\'') NotString else WithinQString
  }

  /** `_extract_string_literal`: value lexes as EXACTLY one string token
    * (leading/trailing whitespace skipped) -> its decoded content. */
  private[graft] def extractStringLiteral(value: String): Option[String] = {
    var i = 0
    val n = value.length
    while (i < n && value(i).isWhitespace) i += 1
    if (i >= n) return None
    val quote = value(i)
    if (quote != '"' && quote != '\'') return None
    i += 1
    val sb = new StringBuilder
    if (quote == '\'') {
      // qstrings take everything literally up to the closing apostrophe
      while (i < n && value(i) != '\'') { sb += value(i); i += 1 }
      if (i >= n) return None
      i += 1
    } else {
      var closed = false
      while (i < n && !closed) {
        value(i) match {
          case '\\' if i + 1 < n =>
            // cfg-lex.l string escapes; unknown escapes keep the char
            sb += (value(i + 1) match {
              case 'n' => '\n'
              case 'r' => '\r'
              case 't' => '\t'
              case 'v' => '\u000b'
              case 'a' => '\u0007'
              case other => other
            })
            i += 2
          case '"' => closed = true; i += 1
          case c => sb += c; i += 1
        }
      }
      if (!closed) return None
    }
    while (i < n && value(i).isWhitespace) i += 1
    if (i < n) None else Some(sb.toString)
  }

  private def encodeAsString(v: String): String = {
    val sb = new StringBuilder
    v.foreach {
      case '"' => sb ++= "\\\""
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\\' => sb ++= "\\\\"
      case c => sb += c
    }
    sb.toString
  }

  /** One substitution pass (`cfg_lexer_subst_invoke`). Throws
    * [[SubstError]] on a dangling backtick, a backtick right after a
    * string-quote backslash, or an apostrophe spliced into a qstring. */
  def invoke(input: String, lookup: String => Option[String]): String = {
    val result = new StringBuilder
    var state = NotString
    var backtick = false
    var refStart = 0
    var i = 0
    while (i < input.length) {
      val c = input(i)
      state = trackStringState(state, c)
      if (!backtick && c == '`') {
        if (state == WithinStringQuotedChar)
          throw new SubstError(
            "cannot subsitute backticked values right after a string quote character")
        backtick = true
        refStart = i + 1
      } else if (backtick && c == '`') {
        backtick = false
        if (refStart == i) result += '`'
        else {
          val value = lookup(input.substring(refStart, i)).getOrElse("")
          if (state == NotString) result ++= value
          else extractStringLiteral(value) match {
            case Some(inner) if state == WithinString =>
              result ++= encodeAsString(inner)
            case Some(inner) => // WithinQString
              if (inner.contains('\''))
                throw new SubstError(
                  "cannot represent apostrophes within apostroph-enclosed string")
              result ++= inner
            case None => result ++= value
          }
        }
      } else if (!backtick) result += c
      i += 1
    }
    if (backtick)
      throw new SubstError("missing closing backtick (`) character")
    result.toString
  }

  def invoke(input: String, args: Map[String, String],
      defs: Map[String, String], globals: Map[String, String]): String =
    invoke(input, resolver(args, defs, globals))
}
