package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** `snmptrapd_scan(record)` — one-pass parse of an snmptrapd output
  * record (the multi-line unit the `snmptrap()` scl source assembles),
  * mirroring `/root/reference/modules/afsnmp/snmptrapd-header-parser.c`
  * + `snmptrapd-parser.c` + `varbindlist-scanner.c`:
  *
  * ```
  * DATE HOST [TRANSPORT_INFO]: [V1_ENTERPRISE_OID
  *   <TAB> V1_TRAP_TYPE (V1_SUBTYPE) Uptime: UPTIME]
  * key = [Type:] value <TAB> key = value ...
  * ```
  *
  * Header: `YYYY-MM-DD HH:MM:SS` timestamp (fixed-width fields,
  * `str-format.c:scan_positive_int`), hostname = non-space run,
  * `[transport info]` closed at the last `]` before the line end, a
  * `:`, then the optional v1 block — taken only when the next line
  * does NOT start with TAB (`_try_parse_v1_info`). Any step failing
  * fails the whole parse (`ok=false` → the row is dropped, exactly
  * like the reference parser returning FALSE).
  *
  * Varbind list: the kv-scanner configured as in
  * `varbindlist_scanner_init` — separator `=`, pair separator TAB,
  * stop char `\n`, key charset `[A-Za-z0-9_.:-]`, a `Type:` annotation
  * stripped from the value head, unquoted values ending at TAB /
  * stop / a space run followed by another `key =`, quoted values
  * dequoted with backslash escapes. Keys normalize `:`-runs to one
  * `_` (`_normalize_key`); `msg` is the set-message-macro(yes)
  * rendering `key1='v1', key2='v2'` over the ORIGINAL keys with
  * `\`/`'` escaped (`_append_name_value_to_generated_message`).
  */
case class SnmpTrapdScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = SnmpTrapdScan.schema
  override def prettyName: String = "snmptrapd_scan"

  override protected def nullSafeEval(v: Any): Any =
    SnmpTrapdScan.scan(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.SnmpTrapdScan.scan($v);""")

  override protected def withNewChildInternal(c: Expression): SnmpTrapdScan =
    copy(child = c)
}

object SnmpTrapdScan {
  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new SnmpTrapdScan(ColumnBridge.expression(text)))
  }

  val schema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("ts", StringType),
    StructField("hostname", StringType),
    StructField("transport_info", StringType),
    StructField("enterprise_oid", StringType),
    StructField("trap_type", StringType),
    StructField("subtype", StringType),
    StructField("uptime", StringType),
    StructField("pairs", MapType(StringType, StringType, valueContainsNull = false)),
    StructField("msg", StringType)))

  private val failed: InternalRow = InternalRow(false, null, null, null,
    null, null, null, null, null, null)

  // varbindlist-scanner.c _is_valid_key_character
  private def isKeyChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '-' || c == ':'

  /** snmptrapd-parser.c `_normalize_key`: every run of ':' → one '_'. */
  private def normalizeKey(k: String): String = {
    if (k.indexOf(':') < 0) return k
    val sb = new java.lang.StringBuilder(k.length)
    var i = 0
    while (i < k.length) {
      if (k.charAt(i) == ':') {
        sb.append('_')
        while (i < k.length && k.charAt(i) == ':') i += 1
      } else { sb.append(k.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `_append_name_value_to_generated_message` value escaping
    * (utf8utils append_unsafe_utf8_as_escaped_text with "'"). */
  private def escapeMsgValue(v: String): String = {
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\' || c == '\'') { sb.append('\\'); sb.append(c) }
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  def scan(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    var i = 0

    def skipSpaces(): Unit = { while (i < n && s.charAt(i) == ' ') i += 1 }
    def expect(c: Char): Boolean =
      if (i < n && s.charAt(i) == c) { i += 1; true } else false

    // str-format.c scan_positive_int: exactly `width` chars of
    // [leading spaces][digits]
    def fixedInt(width: Int): Boolean = {
      var w = width
      while (i < n && w > 0 && s.charAt(i) == ' ') { i += 1; w -= 1 }
      while (i < n && w > 0 && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        i += 1; w -= 1
      }
      w == 0
    }

    // ---- header: timestamp -------------------------------------------------
    skipSpaces()
    val tsStart = i
    if (!(fixedInt(4) && expect('-') && fixedInt(2) && expect('-') &&
        fixedInt(2) && expect(' ') && fixedInt(2) && expect(':') &&
        fixedInt(2) && expect(':') && fixedInt(2))) return failed
    val ts = s.substring(tsStart, i)

    // ---- hostname ----------------------------------------------------------
    skipSpaces()
    val hostStart = i
    while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
    if (i == hostStart) return failed
    val hostname = s.substring(hostStart, i)

    // ---- [transport info] --------------------------------------------------
    skipSpaces()
    if (!expect('[')) return failed
    skipSpaces()
    val tiStart = i
    val nl0 = s.indexOf('\n', tiStart)
    var tiEnd = if (nl0 < 0) return failed else nl0
    while (tiEnd > tiStart && s.charAt(tiEnd) != ']') tiEnd -= 1
    if (s.charAt(tiEnd) != ']') return failed
    val transportInfo = s.substring(tiStart, tiEnd)
    i = tiEnd + 1

    // ---- ':' then optional v1 info -----------------------------------------
    skipSpaces()
    if (!expect(':')) return failed
    var enterpriseOid: String = null
    var trapType: String = null
    var subtype: String = null
    var uptime: String = null
    skipSpaces()
    val nextNl = s.indexOf('\n', i)
    val isV2 = nextNl >= 0 && (nextNl + 1 >= n || s.charAt(nextNl + 1) != '\t')
    if (!isV2) {
      // _try_parse_v1_info steps, each after a space skip
      val eoStart = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > eoStart) enterpriseOid = s.substring(eoStart, i)
      skipSpaces()
      if (!expect('\n')) return failed
      skipSpaces()
      if (!expect('\t')) return failed
      skipSpaces()
      // type ends at '(' (one trailing space backed off), subtype at ')'
      val typeStart = i
      var p = i
      while (p < n && s.charAt(p) != '(' && s.charAt(p) != '\n') p += 1
      if (p >= n || s.charAt(p) != '(') return failed
      var typeEnd = p
      if (typeEnd > typeStart && s.charAt(typeEnd - 1) == ' ') typeEnd -= 1
      trapType = s.substring(typeStart, typeEnd)
      val subStart = p + 1
      p = subStart
      while (p < n && s.charAt(p) != ')' && s.charAt(p) != '\n') p += 1
      if (p >= n || s.charAt(p) != ')') return failed
      subtype = s.substring(subStart, p)
      i = p + 1
      skipSpaces()
      // "Uptime:" then value until newline (not consumed) or EOM
      if (!(i + 7 <= n && s.regionMatches(i, "Uptime:", 0, 7))) return failed
      i += 7
      skipSpaces()
      val upStart = i
      val upNl = s.indexOf('\n', upStart)
      if (upNl < 0) { uptime = s.substring(upStart); i = n }
      else { uptime = s.substring(upStart, upNl); i = upNl }
    }
    skipSpaces()
    if (i < n && !expect('\n')) return failed

    // ---- varbind list (kv-scanner, pair sep TAB, stop '\n') ----------------
    val keys = new ArrayBuffer[Any]
    val vals = new ArrayBuffer[Any]
    val keyPos = scala.collection.mutable.HashMap.empty[String, Int]
    val msg = new java.lang.StringBuilder
    def addNv(origKey: String, value: String, normalize: Boolean): Unit = {
      val k = if (normalize) normalizeKey(origKey) else origKey
      if (normalize) {
        keyPos.get(k) match {
          case Some(p) => vals(p) = UTF8String.fromString(value)
          case None =>
            keyPos(k) = keys.length
            keys += UTF8String.fromString(k)
            vals += UTF8String.fromString(value)
        }
      }
      if (msg.length > 0) msg.append(", ")
      msg.append(origKey).append("='").append(escapeMsgValue(value)).append('\'')
    }
    addNv("hostname", hostname, normalize = false)
    addNv("transport_info", transportInfo, normalize = false)
    if (enterpriseOid != null) addNv("enterprise_oid", enterpriseOid, normalize = false)
    if (trapType != null) addNv("type", trapType, normalize = false)
    if (subtype != null) addNv("subtype", subtype, normalize = false)
    if (uptime != null) addNv("uptime", uptime, normalize = false)

    def keyFollows(from: Int): Boolean = {
      var p = from
      while (p < n && isKeyChar(s.charAt(p))) p += 1
      if (p == from) return false
      while (p < n && s.charAt(p) == ' ') p += 1
      p < n && s.charAt(p) == '='
    }

    var stop = false
    while (!stop) {
      if (i >= n || s.charAt(i) == '\n') stop = true
      else {
        // _extract_key: find '=', walk back over spaces then key chars
        var sep = s.indexOf('=', i)
        var keyStart = -1
        var keyEnd = -1
        var found = false
        while (sep >= 0 && !found) {
          var e = sep
          while (e > i && s.charAt(e - 1) == ' ') e -= 1
          var st = e
          while (st > i && isKeyChar(s.charAt(st - 1))) st -= 1
          if (e > st) { keyStart = st; keyEnd = e; found = true }
          else sep = s.indexOf('=', sep + 1)
        }
        if (!found) stop = true
        else {
          val origKey = s.substring(keyStart, keyEnd)
          i = sep + 1
          // _extract_type annotation: [spaces] TYPE ':' before ' '/'\t'
          var p = i
          while (p < n && (s.charAt(p) == ' ' || s.charAt(p) == '\t')) p += 1
          var q = p
          while (q < n && s.charAt(q) != ':' && s.charAt(q) != ' ' &&
            s.charAt(q) != '\t' && s.charAt(q) != '\n') q += 1
          if (q < n && s.charAt(q) == ':') i = q + 1
          // _extract_value: skip spaces, then decode
          skipSpaces()
          val sb = new java.lang.StringBuilder
          if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val quote = s.charAt(i)
            var j = i + 1
            var closed = false
            while (j < n && !closed) {
              val c = s.charAt(j)
              if (c == '\\' && j + 1 < n) { sb.append(s.charAt(j + 1)); j += 2 }
              else if (c == quote) { closed = true; j += 1 }
              else { sb.append(c); j += 1 }
            }
            if (closed) {
              i = j
              // consume trailing delimiter (spaces/tab) after the quote
              while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
            } else {
              // quotation error: raw value until tab/newline
              sb.setLength(0)
              var k2 = i
              while (k2 < n && s.charAt(k2) != '\t' && s.charAt(k2) != '\n') k2 += 1
              sb.append(s.substring(i, k2))
              i = if (k2 < n && s.charAt(k2) == '\t') k2 + 1 else k2
            }
          } else {
            // unquoted: ends at TAB, stop char, or a space run followed
            // by end / `key =` / TAB (_match_delimiter)
            var done = false
            val vStart = i
            var vEnd = i
            var j = i
            while (!done) {
              if (j >= n || s.charAt(j) == '\n') { vEnd = j; i = j; done = true }
              else if (s.charAt(j) == '\t') { vEnd = j; i = j + 1; done = true }
              else if (s.charAt(j) == ' ') {
                var p2 = j
                while (p2 < n && s.charAt(p2) == ' ') p2 += 1
                if (p2 >= n || keyFollows(p2)) { vEnd = j; i = p2; done = true }
                else if (p2 < n && s.charAt(p2) == '\t') { vEnd = j; i = p2 + 1; done = true }
                else j = p2 // incl. '\n' after spaces: spaces join the value
                            // (match_delimiter returns false there)
              } else j += 1
            }
            sb.append(s.substring(vStart, vEnd))
          }
          addNv(origKey, sb.toString, normalize = true)
        }
      }
    }

    InternalRow(true, UTF8String.fromString(ts),
      UTF8String.fromString(hostname), UTF8String.fromString(transportInfo),
      if (enterpriseOid == null) null else UTF8String.fromString(enterpriseOid),
      if (trapType == null) null else UTF8String.fromString(trapType),
      if (subtype == null) null else UTF8String.fromString(subtype),
      if (uptime == null) null else UTF8String.fromString(uptime),
      new ArrayBasedMapData(new GenericArrayData(keys.toArray),
        new GenericArrayData(vals.toArray)),
      UTF8String.fromString(msg.toString))
  }
}
