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
    rawValues: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = KvScan.schema
  override def prettyName: String = "kv_scan"

  override protected def nullSafeEval(v: Any): Any =
    KvScan.scan(v.asInstanceOf[UTF8String], valueSep, prefix, rawValues)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("kvPrefix", prefix, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.KvScan.scan($v, (char) ${valueSep.toInt}, $p, $rawValues);""")
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

  def scan(text: UTF8String, sep: Char, prefix: String, raw: Boolean): InternalRow = {
    val s = text.toString
    val n = s.length
    val keys = new ArrayBuffer[Any]
    val vals = new ArrayBuffer[Any]
    val keyPos = scala.collection.mutable.HashMap.empty[String, Int]
    val stray = new java.lang.StringBuilder
    var strayNeedsSpace = false
    var strayHasChars = false

    def strayAppend(ch: Char): Unit = {
      if (Character.isWhitespace(ch)) {
        if (strayHasChars) strayNeedsSpace = true
      } else {
        if (strayNeedsSpace) { stray.append(' '); strayNeedsSpace = false }
        stray.append(ch)
        strayHasChars = true
      }
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var consumed = false
      if (isKeyStart(c)) {
        var j = i + 1
        while (j < n && isKeyChar(s.charAt(j))) j += 1
        if (j < n && s.charAt(j) == sep) {
          val key = s.substring(i, j)
          var v = j + 1
          val sb = new java.lang.StringBuilder
          if (v < n && (s.charAt(v) == '"' || s.charAt(v) == '\'')) {
            val quote = s.charAt(v)
            var m = v + 1
            var closed = false
            if (raw) sb.append(quote)
            while (m < n && !closed) {
              val ch = s.charAt(m)
              if (ch == '\\' && m + 1 < n) {
                if (raw) { sb.append(ch); sb.append(s.charAt(m + 1)) }
                else sb.append(s.charAt(m + 1))
                m += 2
              } else if (ch == quote) { closed = true; m += 1; if (raw) sb.append(quote) }
              else { sb.append(ch); m += 1 }
            }
            if (closed) v = m
            else {
              // unterminated quote: treat as bare value to whitespace
              sb.setLength(0)
              while (v < n && !Character.isWhitespace(s.charAt(v))) {
                sb.append(s.charAt(v)); v += 1
              }
            }
          } else {
            while (v < n && !Character.isWhitespace(s.charAt(v))) {
              sb.append(s.charAt(v)); v += 1
            }
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
          i = v
          consumed = true
        }
      }
      if (!consumed) { strayAppend(c); i += 1 }
    }
    val row = new GenericInternalRow(2)
    row.update(0, ArrayBasedMapData(keys.toArray, vals.toArray))
    row.update(1, UTF8String.fromString(stray.toString))
    row
  }

  def apply(text: Column, valueSep: Char, prefix: String, rawValues: Boolean): Column =
    ColumnBridge.column(new KvScan(ColumnBridge.expression(text), valueSep,
      prefix, rawValues))
}
