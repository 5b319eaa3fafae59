package graft.template

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The template language: `$NAME`, `${NAME}`, `${NAME:-default}`,
  * `$(func arg1 arg2 ...)`, `$$` escape, literal text.
  *
  * Mirrors the reference's compiled template representation
  * (`/root/reference/lib/template/repr.h:34-36`: LTE_VALUE | LTE_MACRO |
  * LTE_FUNC, compiler `lib/template/compiler.c`, eval loop
  * `lib/template/eval.c:60-140`). Instead of an eval loop we compile the
  * whole template to ONE Catalyst `Column` (a concat tree), so template
  * evaluation is codegen'd per row with zero interpretation overhead.
  *
  * Missing/unset names render as "" like the reference; `${N:-d}` uses the
  * default when the value is missing OR empty (`eval.c:74-76`).
  */
object Template {
  sealed trait Node
  final case class Lit(text: String) extends Node
  final case class Ref(name: String, default: Option[Parsed]) extends Node
  final case class Func(name: String, args: Seq[Parsed]) extends Node
  final case class Parsed(nodes: Seq[Node])

  // ---- parser ------------------------------------------------------------
  def parse(s: String): Parsed = {
    val nodes = Vector.newBuilder[Node]
    val lit = new StringBuilder
    var i = 0
    def flushLit(): Unit =
      if (lit.nonEmpty) { nodes += Lit(lit.toString); lit.clear() }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '$' && i + 1 < s.length) {
        val n = s.charAt(i + 1)
        if (n == '$') { lit.append('$'); i += 2 }
        else if (n == '{') {
          flushLit()
          val close = findClose(s, i + 1, '{', '}')
          val inner = s.substring(i + 2, close)
          val (name, dflt) = inner.indexOf(":-") match {
            case -1 => (inner, None)
            case k => (inner.substring(0, k), Some(parse(inner.substring(k + 2))))
          }
          nodes += Ref(name, dflt)
          i = close + 1
        } else if (n == '(') {
          flushLit()
          val close = findClose(s, i + 1, '(', ')')
          val inner = s.substring(i + 2, close)
          val parts = splitArgs(inner)
          require(parts.nonEmpty, s"empty template function in: $s")
          nodes += Func(parts.head, parts.tail.map(parse))
          i = close + 1
        } else if (n.isLetterOrDigit || n == '_' || n == '.') {
          flushLit()
          var j = i + 1
          while (j < s.length && (s.charAt(j).isLetterOrDigit ||
            s.charAt(j) == '_' || s.charAt(j) == '.')) j += 1
          // names never end in '.': `$FACILITY.$SEVERITY` ends FACILITY at the dot
          var end = j
          while (end > i + 1 && s.charAt(end - 1) == '.') end -= 1
          nodes += Ref(s.substring(i + 1, end), None)
          i = j
          if (end < j) lit.append(s.substring(end, j))
        } else { lit.append(c); i += 1 }
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    Parsed(nodes.result())
  }

  private def findClose(s: String, open: Int, oc: Char, cc: Char): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == oc) depth += 1
      else if (c == cc) { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced $oc$cc in template: $s")
  }

  /** Split `$(fn a "b c" $(g x))` args on spaces, honoring quotes and
    * nested parens. Quotes are stripped; their content is still a
    * template. */
  private[template] def splitArgs(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var depth = 0
    var quote: Char = 0
    def flush(): Unit = if (cur.nonEmpty) { out += cur.toString; cur.clear() }
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
        else if (c == '\\' && i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 1 }
        else cur.append(c)
      } else c match {
        case '"' | '\'' => quote = c
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case ' ' if depth == 0 => flush()
        case _ => cur.append(c)
      }
      i += 1
    }
    flush()
    out.result()
  }

  // ---- compiler ----------------------------------------------------------
  /** Compile to a single string Column. `resolve` maps a macro/field name
    * to its Column (see [[Macros.resolver]]). */
  def compile(t: Parsed, resolve: String => Column): Column = {
    def nodeCol(n: Node): Column = n match {
      case Lit(s) => lit(s)
      case Ref(name, None) =>
        coalesce(resolve(name).cast("string"), lit(""))
      case Ref(name, Some(d)) =>
        val v = coalesce(resolve(name).cast("string"), lit(""))
        when(v === "", compile(d, resolve)).otherwise(v)
      case Func(name, args) =>
        val f = TemplateFunctions.registry.getOrElse(name,
          throw new IllegalArgumentException(s"unknown template function $$($name)"))
        val targs = args.map { a =>
          val literalText = a.nodes match {
            case Seq() => Some("")
            case Seq(Lit(s)) => Some(s)
            case _ => None
          }
          TemplateFunctions.TArg(compile(a, resolve), literalText)
        }
        coalesce(f(targs).cast("string"), lit(""))
    }
    t.nodes match {
      case Seq() => lit("")
      case Seq(one) => nodeCol(one)
      case many => concat(many.map(nodeCol): _*)
    }
  }

  /** One-step convenience: template string + schema columns -> Column. */
  def column(template: String, columns: Seq[String]): Column =
    compile(parse(template), Macros.resolver(columns.toSet))
}
