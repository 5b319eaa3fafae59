package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** syslog-ng "list" representation (`lib/str-repr/encode.c` /
  * `decode.c`, `lib/scanner/list-scanner/`): comma-separated elements
  * where an element containing commas, quotes, whitespace or escapes is
  * double/single-quoted with backslash escapes. The `$(list-*)`
  * template functions parse/serialize this form — a naive split() loses
  * quoted commas, which the reference's own test_basicfuncs.c battery
  * checks explicitly. */
object ListRepr {

  /** Parse one list string into elements: split on ',' outside quotes,
    * decode quoted elements (same escape set as the kv scanner), drop
    * unquoted-empty elements (",bar" has head "bar"). */
  def parse(s: String, out: ArrayBuffer[String]): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ',') i += 1 // empty unquoted element: dropped
      else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new java.lang.StringBuilder
        var m = i + 1
        var closed = false
        while (m < n && !closed) {
          val ch = s.charAt(m)
          if (ch == '\\' && m + 1 < n) {
            val e = s.charAt(m + 1)
            val dec = e match {
              case 'b' => "\b"; case 'f' => "\f"; case 'n' => "\n"
              case 'r' => "\r"; case 't' => "\t"
              case '\\' | '"' | '\'' => e.toString
              case other => "\\" + other
            }
            sb.append(dec); m += 2
          } else if (ch == quote) { closed = true; m += 1 }
          else { sb.append(ch); m += 1 }
        }
        if (closed) {
          out += sb.toString
          i = m
          if (i < n && s.charAt(i) == ',') i += 1
        } else {
          // unterminated quote: raw element to the next comma
          var e2 = s.indexOf(',', i)
          if (e2 < 0) e2 = n
          out += s.substring(i, e2)
          i = e2 + 1
        }
      } else {
        var e2 = s.indexOf(',', i)
        if (e2 < 0) e2 = n
        out += s.substring(i, e2)
        i = e2 + 1
      }
    }
  }

  def parseToArray(s: UTF8String): ArrayData = {
    val buf = new ArrayBuffer[String]
    parse(s.toString, buf)
    new GenericArrayData(buf.map(e => UTF8String.fromString(e): Any).toArray)
  }

  /** str_repr_encode_append with forbidden_chars = ",". */
  def encodeElement(e: String, sb: java.lang.StringBuilder): Unit = {
    if (e.isEmpty) { sb.append("\"\""); return }
    val hasApos = e.indexOf('\'') >= 0
    val hasQuote = e.indexOf('"') >= 0
    val needsQuoting = hasApos || hasQuote ||
      e.exists(c => c == '\b' || c == '\f' || c == '\n' || c == '\r' ||
        c == '\t' || c == '\\' || c == ' ' || c == ',')
    if (!needsQuoting) { sb.append(e); return }
    val quote = if (hasQuote && !hasApos) '\'' else '"'
    sb.append(quote)
    e.foreach {
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\\' => sb.append("\\\\")
      case '"' if quote == '"' => sb.append("\\\"")
      case other => sb.append(other)
    }
    sb.append(quote)
  }

  def encodeArray(arr: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < arr.numElements()) {
      if (i > 0) sb.append(',')
      val e = arr.getUTF8String(i)
      encodeElement(if (e == null) "" else e.toString, sb)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `list_scan(s)` — list string → decoded element array. */
case class ListScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "list_scan"

  override protected def nullSafeEval(v: Any): Any =
    ListRepr.parseToArray(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ListRepr.parseToArray($v)")

  override protected def withNewChildInternal(c: Expression): ListScan = copy(c)
}

/** `list_encode(arr)` — element array → encoded list string. */
case class ListEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "list_encode"

  override protected def nullSafeEval(v: Any): Any =
    ListRepr.encodeArray(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ListRepr.encodeArray($v)")

  override protected def withNewChildInternal(c: Expression): ListEncode = copy(c)
}

object ListFunctions {
  def list_scan(s: Column): Column =
    ColumnBridge.column(ListScan(ColumnBridge.expression(s)))
  def list_encode(arr: Column): Column =
    ColumnBridge.column(ListEncode(ColumnBridge.expression(arr)))
}
