package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `pcre_subst(text)` — the PCRE substitution engine under `subst()`
  * with the default (pcre) matcher (`/root/reference/lib/logmatcher.c`
  * log_matcher_pcre_re_replace), faithful to the reference's
  * empty-match iteration, which Java's `String.replaceAll` diverges
  * from:
  *
  *   - a zero-length match is replaced, then the SAME position is
  *     retried with NOTEMPTY|ANCHORED before advancing — so
  *     `subst("b*|aa", "@", flags(global))` on "aa" yields "@@@"
  *     (empty, then the anchored non-empty "aa", then empty at end),
  *     where Java's replaceAll gives "@a@a@" (test_matcher.c
  *     empty_global);
  *   - the NOTEMPTY retry is emulated with a `(?:re)(?<!\G)` wrapper
  *     matched with `region(p).lookingAt()` — the trailing lookbehind
  *     rejects a match whose end equals the region start, forcing the
  *     backtracker to find a non-empty alternative like PCRE_NOTEMPTY;
  *   - non-global replaces the first match only (a single pcre_exec);
  *   - no match at all returns the input unchanged (the reference's
  *     replace returns NULL and the caller keeps the original value);
  *   - the replacement is a parsed LogTemplate restricted to match
  *     registers: literals, `$$`, `$N`/`${N}` numbered groups fed from
  *     the CURRENT match (log_matcher_pcre_re_feed_backrefs runs per
  *     match regardless of store-matches), and `${name}` named groups.
  *     A non-participating group renders "".
  *
  * The pattern goes through [[RegexMatchStore.compile]] for the same
  * PCRE→Java translations the match side uses (named-group grammar,
  * class-bracket quirks, octal escapes).
  */
case class PcreSubst(child: Expression, re: String, replacement: String,
    global: Boolean, icase: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "pcre_subst"

  @transient private lazy val engine = PcreSubst.compile(re, replacement, global, icase)

  def substOf(text: UTF8String): UTF8String =
    UTF8String.fromString(engine.run(text.toString))

  override protected def nullSafeEval(v: Any): Any =
    substOf(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ps", this, classOf[PcreSubst].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.substOf($v);")
  }

  override protected def withNewChildInternal(c: Expression): PcreSubst =
    copy(child = c)
}

object PcreSubst {

  /** One replacement-template segment: literal text, or a group ref by
    * number (`idx >= 0`) resolved from the current match. */
  final case class Seg(literal: String, idx: Int)

  final class Engine(pattern: java.util.regex.Pattern,
      nonEmpty: java.util.regex.Pattern, segs: Array[Seg], global: Boolean) {

    def run(text: String): String = {
      val m = pattern.matcher(text)
      if (!global) {
        if (!m.find(0)) return text
        val sb = new java.lang.StringBuilder(text.length)
        sb.append(text, 0, m.start())
        appendRepl(sb, m)
        sb.append(text, m.end(), text.length)
        return sb.toString
      }
      val len = text.length
      val sb = new java.lang.StringBuilder(len)
      var p = 0
      var last = 0
      var lastEmpty = false
      var any = false
      var break = false
      while (!break && p <= len) {
        var ms = -1
        var me = -1
        var mm: java.util.regex.Matcher = null
        if (lastEmpty) {
          // NOTEMPTY | ANCHORED retry at the same position; ^/$ keep
          // their absolute meaning (pcre_exec sees the whole subject)
          val ne = nonEmpty.matcher(text)
          ne.region(p, len)
          ne.useAnchoringBounds(false)
          ne.useTransparentBounds(true)
          if (ne.lookingAt()) { mm = ne; ms = ne.start(); me = ne.end() }
          else {
            // skip one character to avoid spinning on the empty match
            p += 1
            lastEmpty = false
          }
        } else if (m.find(p)) {
          ms = m.start(); me = m.end(); mm = m
        } else break = true
        if (mm != null) {
          any = true
          sb.append(text, last, ms)
          appendRepl(sb, mm)
          lastEmpty = ms == me
          p = me
          last = me
        }
      }
      if (!any) return text
      sb.append(text, last, text.length)
      sb.toString
    }

    private def appendRepl(sb: java.lang.StringBuilder,
        m: java.util.regex.Matcher): Unit = {
      var i = 0
      while (i < segs.length) {
        val s = segs(i)
        if (s.idx < 0) sb.append(s.literal)
        else if (s.idx <= m.groupCount()) {
          val g = m.group(s.idx)
          if (g != null) sb.append(g)
        }
        i += 1
      }
    }
  }

  /** Parse a replacement into segments, or None when it references
    * anything beyond match registers (a real message template — the
    * caller falls back to the per-row template path). */
  def parseReplacement(repl: String,
      named: Seq[(Int, String)]): Option[Array[Seg]] = {
    val segs = Vector.newBuilder[Seg]
    val lit = new java.lang.StringBuilder
    def flush(): Unit =
      if (lit.length > 0) { segs += Seg(lit.toString, -1); lit.setLength(0) }
    var i = 0
    while (i < repl.length) {
      val c = repl.charAt(i)
      if (c == '$' && i + 1 < repl.length) {
        val n = repl.charAt(i + 1)
        if (n == '$') { lit.append('$'); i += 2 }
        else if (n.isDigit) {
          var j = i + 1
          while (j < repl.length && repl.charAt(j).isDigit) j += 1
          val num = repl.substring(i + 1, j).toInt
          if (num > 255) return None
          flush(); segs += Seg(null, num); i = j
        } else if (n == '{') {
          val close = repl.indexOf('}', i + 2)
          if (close < 0) return None
          val name = repl.substring(i + 2, close)
          if (name.nonEmpty && name.forall(_.isDigit)) {
            val num = name.toInt
            if (num > 255) return None
            flush(); segs += Seg(null, num)
          } else {
            // last declared instance wins, like pcre_get_named_substring
            named.filter(_._2 == name).map(_._1).lastOption match {
              case Some(idx) => flush(); segs += Seg(null, idx)
              case None => return None
            }
          }
          i = close + 1
        } else return None
      } else { lit.append(c); i += 1 }
    }
    flush()
    Some(segs.result().toArray)
  }

  def compile(re: String, replacement: String, global: Boolean,
      icase: Boolean): Engine = {
    val flags = if (icase)
      java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.UNICODE_CASE
    else 0
    val c = RegexMatchStore.compile(re, dupnames = true, flags)
    val ne = java.util.regex.Pattern.compile(
      "(?:" + c.pattern.pattern() + ")(?<!\\G)", flags)
    val segs = parseReplacement(replacement, c.named).getOrElse(
      throw new IllegalArgumentException(
        s"subst replacement is not a match-register template: $replacement"))
    new Engine(c.pattern, ne, segs, global)
  }

  /** Can this replacement compile to the register-only engine? */
  def supportsReplacement(re: String, replacement: String): Boolean =
    try {
      val c = RegexMatchStore.compile(re, dupnames = true)
      parseReplacement(replacement, c.named).isDefined
    } catch { case _: Exception => false }

  def apply(text: Column, re: String, replacement: String, global: Boolean,
      icase: Boolean): Column =
    ColumnBridge.column(new PcreSubst(
      ColumnBridge.expression(text), re, replacement, global, icase))
}
