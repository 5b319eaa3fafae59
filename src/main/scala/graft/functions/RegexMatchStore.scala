package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `regex_match_store(text)` — the PCRE match-with-backrefs engine under
  * `match(... flags(store-matches))` and `subst(... flags(store-matches))`
  * (`/root/reference/lib/logmatcher.c` log_matcher_pcre_re_match):
  *
  *   - unanchored search (pcre_exec finds the first match anywhere)
  *   - numbered registers `$0..$N`: groups AFTER the highest
  *     participating group are UNSET (pcre's rc truncation — on
  *     `^a(bc+|b[eh])g|.h$` matching via the second alternative, `$1`
  *     is unset), while non-participating groups BEFORE it read as ""
  *     (`test_rewrite.c:161` vs `test_filters_regexp.c:95`)
  *   - named groups `(?P<n>...)` / `(?<n>...)` store under their NAME;
  *     names may contain underscores and (with `dupnames` =
  *     `flags(dupnames)`, LMF_DUPNAMES) repeat — the last participating
  *     instance wins. Both are beyond Java's group-name grammar, so the
  *     pattern is rewritten to plain groups and names resolve by index.
  *
  * Returns `struct<matched boolean, groups array<string>,
  * named map<string,string>>`; a null text yields null.
  */
case class RegexMatchStore(child: Expression, re: String,
    dupnames: Boolean = false, icase: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("matched", BooleanType, nullable = false),
    StructField("groups", ArrayType(StringType, containsNull = true)),
    StructField("named", MapType(StringType, StringType))))

  override def prettyName: String = "regex_match_store"

  @transient private lazy val compiled = RegexMatchStore.compile(re, dupnames,
    if (icase) java.util.regex.Pattern.CASE_INSENSITIVE |
      java.util.regex.Pattern.UNICODE_CASE else 0)

  def matchOf(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow =
    RegexMatchStore.run(compiled, text.toString)

  override protected def nullSafeEval(v: Any): Any =
    matchOf(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rms", this, classOf[RegexMatchStore].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.matchOf($v);")
  }

  override protected def withNewChildInternal(c: Expression): RegexMatchStore =
    copy(child = c)
}

object RegexMatchStore {

  final case class Compiled(pattern: java.util.regex.Pattern,
      groupCount: Int, named: Seq[(Int, String)])

  /** POSIX class names → Java US-ASCII class escapes (pcre_compile's
    * posix_names table). */
  private[functions] val posixClasses: Map[String, String] = Map(
    "alnum" -> "\\p{Alnum}", "alpha" -> "\\p{Alpha}",
    "ascii" -> "\\p{ASCII}", "blank" -> "\\p{Blank}",
    "cntrl" -> "\\p{Cntrl}", "digit" -> "\\p{Digit}",
    "graph" -> "\\p{Graph}", "lower" -> "\\p{Lower}",
    "print" -> "\\p{Print}", "punct" -> "\\p{Punct}",
    "space" -> "\\s", "upper" -> "\\p{Upper}",
    "word" -> "\\w", "xdigit" -> "\\p{XDigit}")

  /** Rewrite PCRE named groups to plain groups, recording name →
    * group-index; validate name grammar and dup policy like pcre_compile
    * with/without PCRE_DUPNAMES. Throws on invalid patterns — the
    * reference's filter creation returns NULL there
    * (`test_filters_regexp.c:60-87`). */
  def compile(re: String, dupnames: Boolean, flags: Int = 0): Compiled = {
    val sb = new java.lang.StringBuilder(re.length)
    val named = Vector.newBuilder[(Int, String)]
    val seen = scala.collection.mutable.HashSet.empty[String]
    var groups = 0
    var i = 0
    var inClass = false
    while (i < re.length) {
      val c = re.charAt(i)
      if (c == '\\' && i + 1 < re.length) {
        val n = re.charAt(i + 1)
        if (inClass && n >= '1' && n <= '7')
          // pcre reads \1..\7 inside a class as octal; Java needs \0N
          sb.append("\\0").append(n)
        else sb.append(c).append(n)
        i += 2
      } else if (inClass) {
        // POSIX named classes inside a class ([[:digit:]] etc.) — pcre
        // speaks them, Java wants \p{...}
        val posix = if (c == '[' && re.startsWith(":", i + 1))
          re.indexOf(":]", i + 2) match {
            case -1 => None
            case e => RegexMatchStore.posixClasses.get(re.substring(i + 2, e))
              .map(_ -> (e + 2 - i))
          }
        else None
        posix match {
          case Some((repl, consumed)) => sb.append(repl); i += consumed
          case None =>
            if (c == ']') inClass = false
            sb.append(c); i += 1
        }
      } else if (c == '[') {
        inClass = true; sb.append(c); i += 1
        // a ']' directly after '[' (or '[^') is literal in pcre; Java
        // needs it escaped ("a[]]b", "a[^]b]" — test_filters_regexp.c)
        if (i < re.length && re.charAt(i) == '^') { sb.append('^'); i += 1 }
        if (i < re.length && re.charAt(i) == ']') { sb.append("\\]"); i += 1 }
      } else if (c == '(') {
        val rest = re.substring(i)
        val NamedRe = "^\\((\\?P?<([^<>=!][^<>]*)>|\\?'([^']*)')".r
        if (rest.startsWith("(?")) {
          NamedRe.findFirstMatchIn(rest) match {
            case Some(m) =>
              val name = Option(m.group(2)).getOrElse(m.group(3))
              require(name.nonEmpty && !name.head.isDigit &&
                name.forall(ch => ch.isLetterOrDigit || ch == '_'),
                s"bad group name '$name' in: $re")
              require(dupnames || seen.add(name),
                s"duplicate group name '$name' without dupnames in: $re")
              groups += 1
              named += ((groups, name))
              sb.append('(')
              i += m.matched.length
            case None =>
              // (?: (?= (?! (?<= (?<! (?i) ... — non-capturing
              sb.append(c); i += 1
          }
        } else {
          groups += 1
          sb.append(c); i += 1
        }
      } else {
        sb.append(c); i += 1
      }
    }
    // pcre's octal rule: \NN (multi-digit) with no such capture group is
    // an octal character; Java would read it as a (bad) backreference
    // ("\141" matches 'a', test_filters_regexp.c:178)
    val octalFixed = "(?<!\\\\)\\\\([1-9][0-9]{1,2})".r.replaceAllIn(sb.toString, m =>
      if (m.group(1).toInt > groups)
        java.util.regex.Matcher.quoteReplacement("\\0" + m.group(1))
      else java.util.regex.Matcher.quoteReplacement(m.matched))
    Compiled(java.util.regex.Pattern.compile(octalFixed, flags), groups, named.result())
  }

  def run(c: Compiled, text: String): org.apache.spark.sql.catalyst.InternalRow = {
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    val m = c.pattern.matcher(text)
    if (!m.find()) {
      return org.apache.spark.sql.catalyst.InternalRow(false, null, null)
    }
    // pcre rc truncation: registers above the highest participating
    // group are unset
    var maxIdx = 0
    var i = 1
    while (i <= c.groupCount) {
      if (m.group(i) != null) maxIdx = i
      i += 1
    }
    val groups = new Array[Any](maxIdx + 1)
    i = 0
    while (i <= maxIdx) {
      val g = m.group(i)
      groups(i) = UTF8String.fromString(if (g == null) "" else g)
      i += 1
    }
    val namedPairs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    c.named.foreach { case (idx, name) =>
      val g = m.group(idx)
      if (g != null) namedPairs(name) = g
    }
    val mapData = new ArrayBasedMapData(
      new GenericArrayData(namedPairs.keys.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(namedPairs.values.map(UTF8String.fromString).toArray[Any]))
    org.apache.spark.sql.catalyst.InternalRow(true, new GenericArrayData(groups), mapData)
  }

  def apply(text: Column, re: String, dupnames: Boolean): Column =
    ColumnBridge.column(new RegexMatchStore(ColumnBridge.expression(text), re, dupnames))

  def apply(text: Column, re: String, dupnames: Boolean, icase: Boolean): Column =
    ColumnBridge.column(
      new RegexMatchStore(ColumnBridge.expression(text), re, dupnames, icase))
}
