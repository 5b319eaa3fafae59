package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `cisco_scan(line)` — the cisco-parser() structural parse
  * (`/root/reference/scl/cisco/plugin.conf`) as ONE linear scan,
  * replacing the regex chain in the Column-composed form (3 rlikes +
  * 3 regexp_extracts + 2 regexp_replaces per row, each a backtracking
  * Java regex; same treatment apache_scan gave the LogFormat regex).
  *
  * Shape: `<PRI>(seq: )(host: )(*timestamp: )%FAC-SEV-MNEMONIC: text`
  *
  * Returns a struct `(pri int, fac int, sev int, facs, sevs, mnem,
  * host, ts_text, msg string)` or NULL when the line is not structural
  * cisco (`^<\d{1,3}>.*: %` + a >=3-part triplet). Semantics mirror the
  * previous Column form exactly:
  *   - header = text before the FIRST ": %", body after it;
  *   - triplet = body up to the first ':' then first ' '; 4+ `-`-parts
  *     fold part2 into the facility (STANDBY forms);
  *   - a leading `NNN: ` (or bare `NNN`) sequence number is dropped
  *     from the header;
  *   - the remaining header is either the timestamp, `host: timestamp`,
  *     or a bare colon-free host;
  *   - `ts_text` is the matched timestamp with the `*` unsynced-clock
  *     marker stripped — the caller prepends the reference year and
  *     runs try_to_timestamp (zone semantics unchanged);
  *   - `msg` is `%` + body (the classified message with its triplet).
  */
case class CiscoScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("pri", IntegerType, nullable = false),
    StructField("fac", IntegerType, nullable = false),
    StructField("sev", IntegerType, nullable = false),
    StructField("facs", StringType, nullable = false),
    StructField("sevs", StringType, nullable = false),
    StructField("mnem", StringType, nullable = false),
    StructField("host", StringType, nullable = true),
    StructField("ts_text", StringType, nullable = true),
    StructField("msg", StringType, nullable = false)))

  override def prettyName: String = "cisco_scan"

  override protected def nullSafeEval(v: Any): Any =
    CiscoScan.scan(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.CiscoScan.scan($v);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(c: Expression): CiscoScan =
    copy(child = c)
}

object CiscoScan {

  /** Matches the timestamp regex
    * `\*?[A-Za-z]{3} [0-9 ]?\d{1,2} (\d{4} )?\d{2}:\d{2}:\d{2}
    * (\.\d{3})?( (AM|PM))?` anchored to END of `s`. Returns the start
    * of the de-starred text, or -1. */
  private def tsMatch(s: String, b: Int): Int = {
    val n = s.length
    var i = b
    val ret = if (i < n && s.charAt(i) == '*') i + 1 else i
    i = ret
    // month: exactly 3 letters + ' '
    var k = 0
    while (i < n && k < 3 && {
      val c = s.charAt(i); (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
    }) { i += 1; k += 1 }
    if (k != 3 || i >= n || s.charAt(i) != ' ') return -1
    i += 1
    // day: [0-9 ]?\d{1,2} then ' '
    if (i < n && s.charAt(i) == ' ') {
      i += 1
      var d = 0
      while (i < n && d < 2 && isDigit(s.charAt(i))) { i += 1; d += 1 }
      if (d == 0) return -1
    } else {
      var d = 0
      while (i < n && d < 3 && isDigit(s.charAt(i))) { i += 1; d += 1 }
      if (d == 0) return -1
      if (i < n && isDigit(s.charAt(i))) return -1 // 4+ digits never match
    }
    if (i >= n || s.charAt(i) != ' ') return -1
    i += 1
    // optional year: \d{4}' ' followed by a valid HH:MM:SS tail
    if (i + 4 < n && isDigit(s.charAt(i)) && isDigit(s.charAt(i + 1)) &&
        isDigit(s.charAt(i + 2)) && isDigit(s.charAt(i + 3)) &&
        s.charAt(i + 4) == ' ') {
      val afterYear = hmsTail(s, i + 5)
      if (afterYear >= 0) return ret
      // backtrack: year group not taken
    }
    if (hmsTail(s, i) >= 0) ret else -1
  }

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** `\d{2}:\d{2}:\d{2}(\.\d{3})?( (AM|PM))?$` from `b`; >=0 on a full
    * match to end-of-string. */
  private def hmsTail(s: String, b: Int): Int = {
    val n = s.length
    var i = b
    def two(): Boolean =
      if (i + 1 < n && isDigit(s.charAt(i)) && isDigit(s.charAt(i + 1))) {
        i += 2; true
      } else false
    def colon(): Boolean =
      if (i < n && s.charAt(i) == ':') { i += 1; true } else false
    if (!two() || !colon() || !two() || !colon() || !two()) return -1
    // (\.\d{3})? — '.' + exactly 3 digits; a 4th digit makes the whole
    // anchored pattern unmatchable (the backtracked-away '.' cannot
    // start the AM/PM group or the end)
    if (i < n && s.charAt(i) == '.') {
      if (i + 3 >= n || !isDigit(s.charAt(i + 1)) ||
          !isDigit(s.charAt(i + 2)) || !isDigit(s.charAt(i + 3))) return -1
      if (i + 4 < n && isDigit(s.charAt(i + 4))) return -1
      i += 4
    }
    // ( (AM|PM))?$
    if (i == n) return i
    if (i + 3 == n && s.charAt(i) == ' ' &&
        (s.charAt(i + 1) == 'A' || s.charAt(i + 1) == 'P') &&
        s.charAt(i + 2) == 'M') return n
    -1
  }

  def scan(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    // <PRI>
    if (n < 3 || s.charAt(0) != '<') return null
    var i = 1
    var pri = 0
    var d = 0
    while (i < n && d < 3 && isDigit(s.charAt(i))) {
      pri = pri * 10 + (s.charAt(i) - '0'); i += 1; d += 1
    }
    if (d == 0 || i >= n || s.charAt(i) != '>') return null
    i += 1
    // first ": %" — the rlike form this scan mirrors is
    // `^<\d{1,3}>.*: %` where '.' does not cross '\n', so the marker
    // must sit on the first line
    val idx = s.indexOf(": %", i)
    if (idx < 0) return null
    val nl = s.indexOf('\n', i)
    if (nl >= 0 && nl < idx) return null
    val header = s.substring(i, idx)
    val body = s.substring(idx + 3)
    // triplet: body to first ':' then first ' '
    var te = body.indexOf(':')
    if (te < 0) te = body.length
    val sp = body.indexOf(' ')
    if (sp >= 0 && sp < te) te = sp
    val triplet = body.substring(0, te)
    val parts = triplet.split("-", -1)
    if (parts.length < 3) return null
    val quad = parts.length >= 4
    val facs = if (quad) parts(0) + "-" + parts(1) else parts(0)
    val sevs = if (quad) parts(2) else parts(1)
    val mnem = if (quad) parts(3) else parts(2)
    // seqno strip: ^([0-9]+)?(: )?
    var h = 0
    val hn = header.length
    while (h < hn && isDigit(header.charAt(h))) h += 1
    if (h + 1 < hn && header.charAt(h) == ':' && header.charAt(h + 1) == ' ')
      h += 2
    // classify the remaining header
    var host: String = null
    var tsText: String = null
    val full = tsMatch(header, h)
    if (full >= 0) tsText = header.substring(full)
    else {
      val colon = header.indexOf(':', h)
      if (colon > h && colon + 1 < hn && header.charAt(colon + 1) == ' ') {
        val tb = tsMatch(header, colon + 2)
        if (tb >= 0) { host = header.substring(h, colon); tsText = header.substring(tb) }
      }
      if (tsText == null && colon < 0 && h < hn)
        host = header.substring(h)
    }
    InternalRow(
      pri, pri / 8, pri % 8,
      UTF8String.fromString(facs), UTF8String.fromString(sevs),
      UTF8String.fromString(mnem),
      if (host == null) null else UTF8String.fromString(host),
      if (tsText == null) null else UTF8String.fromString(tsText),
      UTF8String.fromString("%" + body))
  }

  def apply(text: Column): Column =
    ColumnBridge.column(new CiscoScan(ColumnBridge.expression(text)))
}
