package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `apache_scan(line)` — the four Apache LogFormat shapes
  * (common / combined, each with an optional `vhost:port ` prefix,
  * `/root/reference/scl/apache/apache.conf`) as ONE linear scan.
  *
  * Replaces the 11-group packing regex: a Java regex with nested
  * optional groups and the unrolled quoted-field pattern costs
  * ~100-200 µs/row under backtracking; this scanner is a single
  * forward walk (~1-2 µs/row), the same treatment kv_scan gave the
  * kv regex. Group semantics mirror the regex exactly:
  *
  * `[1]vhost [2]port [3]clientip [4]ident [5]auth [6]timestamp
  * [7]rawrequest [8]response [9]bytes [10]referrer [11]agent`
  *
  * Quoted fields return their INNER text verbatim — `""` escapes
  * (escape-double-char dialect) are preserved for the downstream
  * unescape, like the regex groups were. Absent optional groups
  * return "" (the regexp_replace convention). A line that does not
  * parse returns NULL.
  */
case class ApacheScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "apache_scan"

  override protected def nullSafeEval(v: Any): Any =
    ApacheScan.scan(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.ApacheScan.scan($v);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(c: Expression): ApacheScan =
    copy(child = c)
}

object ApacheScan {

  private def isVhostChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_'

  /** Null when the line doesn't match any of the four shapes. */
  def scan(text: UTF8String): GenericArrayData = {
    val s = text.toString
    // the optional vhost:port prefix is tried first (the regex's
    // greedy optional group), falling back to no-prefix
    var j = 0
    val n = s.length
    while (j < n && isVhostChar(s.charAt(j))) j += 1
    if (j > 0 && j < n && s.charAt(j) == ':') {
      var k = j + 1
      while (k < n && s.charAt(k) >= '0' && s.charAt(k) <= '9') k += 1
      if (k > j + 1 && k < n && s.charAt(k) == ' ') {
        val withPrefix = scanFrom(s, k + 1, s.substring(0, j), s.substring(j + 1, k))
        if (withPrefix != null) return withPrefix
      }
    }
    scanFrom(s, 0, "", "")
  }

  private def scanFrom(s: String, start: Int, vhost: String,
      port: String): GenericArrayData = {
    val n = s.length
    var i = start

    // (\S+) followed by a single literal space
    def token(): String = {
      val b = i
      while (i < n && s.charAt(i) != ' ') i += 1
      if (i == b) return null
      s.substring(b, i)
    }
    def space(): Boolean =
      if (i < n && s.charAt(i) == ' ') { i += 1; true } else false
    // quoted field, "" escapes kept verbatim; returns inner text,
    // leaves i after the closing quote
    def quoted(): String = {
      if (i >= n || s.charAt(i) != '"') return null
      i += 1
      val b = new java.lang.StringBuilder
      while (i < n) {
        val c = s.charAt(i)
        if (c == '"') {
          if (i + 1 < n && s.charAt(i + 1) == '"') { b.append("\"\""); i += 2 }
          else { i += 1; return b.toString }
        } else { b.append(c); i += 1 }
      }
      null
    }

    val clientip = token(); if (clientip == null || !space()) return null
    val ident = token(); if (ident == null || !space()) return null
    val auth = token(); if (auth == null || !space()) return null
    // \[([^\]]*)\]
    if (i >= n || s.charAt(i) != '[') return null
    i += 1
    val tb = i
    while (i < n && s.charAt(i) != ']') i += 1
    if (i >= n) return null
    val time = s.substring(tb, i)
    i += 1
    if (!space()) return null
    val rawrequest = quoted(); if (rawrequest == null || !space()) return null
    val response = token(); if (response == null || !space()) return null
    val bytes = token(); if (bytes == null) return null
    var referrer = ""
    var agent = ""
    if (i < n && s.charAt(i) == ' ' && i + 1 < n && s.charAt(i + 1) == '"') {
      i += 1
      referrer = quoted(); if (referrer == null || !space()) return null
      agent = quoted(); if (agent == null) return null
    }
    // \s*$
    while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    if (i != n) return null
    new GenericArrayData(Array[Any](
      UTF8String.fromString(vhost), UTF8String.fromString(port),
      UTF8String.fromString(clientip), UTF8String.fromString(ident),
      UTF8String.fromString(auth), UTF8String.fromString(time),
      UTF8String.fromString(rawrequest), UTF8String.fromString(response),
      UTF8String.fromString(bytes), UTF8String.fromString(referrer),
      UTF8String.fromString(agent)))
  }

  def apply(text: Column): Column =
    ColumnBridge.column(new ApacheScan(ColumnBridge.expression(text)))
}
