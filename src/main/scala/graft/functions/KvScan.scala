package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** `kv_scan(text)` — the kv-scanner as one hand-rolled pass
  * (`/root/reference/lib/scanner/kv-scanner/kv-scanner.c` semantics):
  * `key<sep>value` pairs with single/double-quoted values (backslash
  * escapes), everything else collected as stray words. Key charset:
  * alnum start, then `[A-Za-z0-9_.-]`.
  *
  * Exists because the regex formulation costs ~30µs/row (alternation
  * backtracking × two extraction passes); this scanner is one linear
  * walk. Returns `struct(pairs map<string,string>, stray string)` —
  * Catalyst CSEs the scan when a query reads both fields.
  *
  * `rawValues=true` keeps values verbatim (quotes intact) for consumers
  * that need quoting info (linux-audit hex rule).
  */
case class KvScan(child: Expression, valueSep: Char = '=', prefix: String = "",
    rawValues: Boolean = false, pairSep: String = ", ") extends UnaryExpression {

  override def dataType: DataType = KvScan.schema
  override def prettyName: String = "kv_scan"

  override protected def nullSafeEval(v: Any): Any =
    KvScan.scan(v.asInstanceOf[UTF8String], valueSep, prefix, rawValues, pairSep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("kvPrefix", prefix, "java.lang.String")
    val ps = ctx.addReferenceObj("kvPairSep", pairSep, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.KvScan.scan($v, (char) ${valueSep.toInt}, $p, $rawValues, $ps);""")
  }

  override protected def withNewChildInternal(c: Expression): KvScan =
    copy(child = c)
}

object KvScan {
  val schema: StructType = StructType(Seq(
    StructField("pairs", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false),
    StructField("stray", StringType, nullable = false)))

  private def isKeyStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
  private def isKeyChar(c: Char): Boolean =
    isKeyStart(c) || c == '_' || c == '.' || c == '-'

  def scan(text: UTF8String, sep: Char, prefix: String, raw: Boolean): InternalRow =
    scan(text, sep, prefix, raw, ", ")

  def scan(text: UTF8String, sep: Char, prefix: String, raw: Boolean,
      pairSep: String): InternalRow = {
    val s = text.toString
    val n = s.length
    val keys = new ArrayBuffer[Any]
    val vals = new ArrayBuffer[Any]
    val keyPos = scala.collection.mutable.HashMap.empty[String, Int]
    val stray = new java.lang.StringBuilder
    var strayHasChars = false

    // stray chunks trim spaces at both ends, join with ',' and each
    // chunk is str-repr encoded with forbidden chars "," — so a chunk
    // containing spaces/commas/quotes arrives quoted, exactly the list
    // repr the reference's extract-stray-words-into() consumers parse
    // with $(list-*) (kv-scanner.c:91-112 _extract_stray_word →
    // str_repr_encode_append; test_kv_parser.c:158 pins the quoted form)
    def strayChunk(from: Int, to0: Int): Unit = {
      var a = from; var b = to0
      while (a < b && s.charAt(a) == ' ') a += 1
      while (b > a && s.charAt(b - 1) == ' ') b -= 1
      if (b > a) {
        if (strayHasChars) stray.append(',')
        ListRepr.encodeElement(s.substring(a, b), stray)
        strayHasChars = true
      }
    }

    // _key_follows: valid key chars, optional spaces, then the separator
    def keyFollows(at: Int): Boolean = {
      var k = at
      while (k < n && isKeyChar(s.charAt(k))) k += 1
      if (k == at) return false
      while (k < n && s.charAt(k) == ' ') k += 1
      k < n && s.charAt(k) == sep
    }

    // pair separator, default ", " (kv_scanner_init / pair-separator())
    def pairSepAt(at: Int): Boolean =
      pairSep.nonEmpty && s.startsWith(pairSep, at)

    var i = 0
    var done = false
    while (!done) {
      // ---- _extract_key: find the next separator whose backward walk
      // (spaces, then key chars) yields a non-empty key ------------------
      var sepAt = s.indexOf(sep, i)
      var keyStart = -1; var keyEnd = -1
      while (sepAt >= 0 && keyStart < 0) {
        var e = sepAt
        while (e > i && s.charAt(e - 1) == ' ') e -= 1
        var st = e
        while (st > i && isKeyChar(s.charAt(st - 1))) st -= 1
        if (e - st >= 1) { keyStart = st; keyEnd = e }
        else sepAt = s.indexOf(sep, sepAt + 1)
      }
      if (keyStart < 0) { strayChunk(i, n); done = true }
      else {
        strayChunk(i, keyStart)
        val key = s.substring(keyStart, keyEnd)
        var v = sepAt + 1

        // ---- _skip_initial_spaces: spaces that are not yet a delimiter
        var skipping = true
        while (skipping && v < n && s.charAt(v) == ' ') {
          var k = v
          while (k < n && s.charAt(k) == ' ') k += 1
          if (k == n || keyFollows(k) || pairSepAt(k)) skipping = false
          else v += 1
        }

        // ---- value decode ------------------------------------------------
        val sb = new java.lang.StringBuilder
        var next = -1 // input position after the value + delimiter
        if (v < n && (s.charAt(v) == '"' || s.charAt(v) == '\'')) {
          // quoted: escapes decode; the closing quote must be followed by
          // a delimiter or EOS, else quotation error -> raw fallback
          val quote = s.charAt(v)
          var m = v + 1
          var closedAt = -1
          while (m < n && closedAt < 0) {
            val ch = s.charAt(m)
            if (ch == '\\' && m + 1 < n) {
              val e = s.charAt(m + 1)
              val dec = e match {
                case 'b' => "\b"; case 'f' => "\f"; case 'n' => "\n"
                case 'r' => "\r"; case 't' => "\t"
                case '\\' | '"' | '\'' => e.toString
                case other => "\\" + other // unknown escape stays verbatim
              }
              sb.append(dec); m += 2
            } else if (ch == quote) closedAt = m
            else { sb.append(ch); m += 1 }
          }
          if (closedAt >= 0 &&
              (closedAt + 1 == n || s.charAt(closedAt + 1) == ' ' ||
                pairSepAt(closedAt + 1))) {
            next = closedAt + 1
            if (next < n && pairSepAt(next)) next += pairSep.length
            else if (next < n && s.charAt(next) == ' ') next += 1
            if (raw) { sb.setLength(0); sb.append(s, v, closedAt + 1) }
          } else sb.setLength(0) // quotation error -> fall through to raw
        }
        if (next < 0) {
          // unquoted (or fallback): value runs until a space-run followed
          // by EOS / next key / pair separator, or a direct pair separator
          var m = v
          var endAt = -1
          while (m < n && endAt < 0) {
            val ch = s.charAt(m)
            if (ch == ' ') {
              // a pair separator that itself starts with a space matches
              // before space-skipping (_pair_separator_starts_with_a_space)
              if (pairSep.startsWith(" ") && pairSepAt(m)) {
                endAt = m; next = m + pairSep.length
              } else {
                var k = m
                while (k < n && s.charAt(k) == ' ') k += 1
                if (k == n || keyFollows(k)) { endAt = m; next = k }
                else if (pairSepAt(k)) { endAt = m; next = k + pairSep.length }
                else m += 1
              }
            } else if (pairSepAt(m)) { endAt = m; next = m + pairSep.length }
            else m += 1
          }
          if (endAt < 0) { endAt = n; next = n }
          sb.setLength(0)
          sb.append(s, v, endAt)
        }

        // repeated key: last occurrence wins, value overwritten in place
        // (reference kv-parser sets the NV entry, never duplicates it)
        val fullKey = prefix + key
        val at = keyPos.getOrElse(fullKey, -1)
        if (at >= 0) {
          vals(at) = UTF8String.fromString(sb.toString)
        } else {
          keyPos(fullKey) = keys.length
          keys += UTF8String.fromString(fullKey)
          vals += UTF8String.fromString(sb.toString)
        }
        i = next
        if (i >= n) done = true
      }
    }
    val row = new GenericInternalRow(2)
    row.update(0, ArrayBasedMapData(keys.toArray, vals.toArray))
    row.update(1, UTF8String.fromString(stray.toString))
    row
  }

  def apply(text: Column, valueSep: Char, prefix: String,
      rawValues: Boolean): Column =
    apply(text, valueSep, prefix, rawValues, ", ")

  def apply(text: Column, valueSep: Char, prefix: String, rawValues: Boolean,
      pairSep: String): Column =
    ColumnBridge.column(new KvScan(ColumnBridge.expression(text), valueSep,
      prefix, rawValues, pairSep))
}
