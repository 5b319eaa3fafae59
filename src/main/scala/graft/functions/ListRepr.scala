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

  // str_repr_decode state machine (lib/str-repr/decode.c:29-210)
  private final val Initial = 0
  private final val QString = 1
  private final val Backslash = 2
  private final val ExpectDelim = 3
  private final val QError = 4
  private final val Unquoted = 5
  private final val FinSuccess = 6
  private final val FinFailure = 7

  /** One str_repr token from `start` with delimiter ','. Returns
    * (decoded value, end position, success). The reference's exact
    * semantics: a closing quote must be followed by the delimiter (or
    * EOF) — ANY other character poisons the whole token to raw
    * ("'foo'bar" and "'foo''bar'" are single RAW elements,
    * test_list_scanner.c handles_single_quotes); an unterminated quote
    * is raw to END of input INCLUDING commas ("bar,'foo," yields
    * "'foo,"); inside quotes `\b \f \n \r \t \\` decode, the MATCHING
    * quote's escape drops its backslash, any other escape keeps it
    * (decode.c _decode_backslash_escape). */
  private def decodeOne(s: String, start: Int): (String, Int, Boolean) = {
    val n = s.length
    val sb = new java.lang.StringBuilder
    var quote: Char = 0
    var state = Initial
    var i = start
    while (i < n && state != FinSuccess && state != FinFailure) {
      val c = s.charAt(i)
      state = state match {
        case Initial =>
          if (c == ',') FinSuccess
          else if (c == '"' || c == '\'') { quote = c; QString }
          else { sb.append(c); Unquoted }
        case QString =>
          if (c == quote) ExpectDelim
          else if (c == '\\') Backslash
          else { sb.append(c); QString }
        case Backslash =>
          c match {
            case 'b' => sb.append('\b'); case 'f' => sb.append('\f')
            case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
            case 't' => sb.append('\t'); case '\\' => sb.append('\\')
            case other =>
              if (quote != other) sb.append('\\')
              sb.append(other)
          }
          QString
        case ExpectDelim =>
          if (c == ',') FinSuccess else QError
        case QError =>
          if (c == ',') FinFailure else QError
        case Unquoted =>
          if (c == ',') FinSuccess else { sb.append(c); Unquoted }
      }
      i += 1
    }
    // at EOF: INITIAL / EXPECT_DELIMITER / UNQUOTED / SUCCESS accept
    val ok = state == Initial || state == ExpectDelim ||
      state == Unquoted || state == FinSuccess
    (sb.toString, i, ok)
  }

  /** Parse one list string into elements (list-scanner.c:95-170):
    * unquoted-empty elements (leading commas) skip, each token decodes
    * via [[decodeOne]], a failed decode keeps the RAW consumed text. */
  def parse(s: String, out: ArrayBuffer[String]): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && s.charAt(i) == ',') i += 1
      if (i < n) {
        val (value, end, ok) = decodeOne(s, i)
        out += (if (ok) value else s.substring(i, end))
        i = end
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
