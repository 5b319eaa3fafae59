package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `format_json(map)` — $(format-json)'s nested-object reconstruction
  * from dot-notation keys (`/root/reference/modules/json/format-json.c`,
  * value-pairs walker `lib/value-pairs/value-pairs.c` vp_walker): key
  * `a.b.c` nests as {"a":{"b":{"c":...}}}, keys emit sorted, values are
  * JSON strings (string-first model). A key that is both a scalar and a
  * prefix of deeper keys keeps the deeper object (the walker's
  * object-wins rule). Inverse of [[JsonFlatten]].
  */
case class FormatJson(child: Expression, flat: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = if (flat) "format_flat_json" else "format_json"

  override protected def nullSafeEval(v: Any): Any =
    if (flat) FormatJson.renderFlat(v.asInstanceOf[MapData])
    else FormatJson.render(v.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (flat) "renderFlat" else "render"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.FormatJson.$fn($v);")
  }

  override protected def withNewChildInternal(c: Expression): FormatJson =
    copy(child = c)
}

object FormatJson {

  /** $(format-flat-json): keys stay literal (no dot-nesting), sorted. */
  def renderFlat(m: MapData): UTF8String = {
    val n = m.numElements()
    val pairs = new Array[(String, String)](n)
    val ks = m.keyArray
    val vs = m.valueArray
    var i = 0
    while (i < n) {
      pairs(i) = (ks.getUTF8String(i).toString,
        if (vs.isNullAt(i)) "" else vs.getUTF8String(i).toString)
      i += 1
    }
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    val sorted = pairs.sortBy(_._1)
    var j = 0
    while (j < sorted.length) {
      if (j > 0) sb.append(',')
      appendJsonString(sb, sorted(j)._1)
      sb.append(':')
      appendJsonValue(sb, sorted(j)._2)
      j += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  /** The vp_walker key tokenizer (`lib/value-pairs/value-pairs.c:
    * 620-675`): dots split levels, EXCEPT (a) an SDATA enterprise id —
    * `@` followed by digit/dot-digit runs — stays inside its token
    * (`win@18372.4` is one level), and (b) a zero-length token merges
    * the dot into the following token (`.program` with
    * --leave-initial-dot is one level, dot included). */
  private[graft] def splitKey(key: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](4)
    var start = 0
    var i = 0
    while (i < key.length) {
      key.charAt(i) match {
        case '@' =>
          // vp_walker_skip_sdata_enterprise_id
          i += 1
          while (i < key.length && key.charAt(i).isDigit) i += 1
          while (i + 1 < key.length && key.charAt(i) == '.' &&
              key.charAt(i + 1).isDigit) {
            i += 1
            while (i < key.length && key.charAt(i).isDigit) i += 1
          }
        case '.' if start != i =>
          out += key.substring(start, i)
          i += 1
          start = i
        case _ =>
          // includes the zero-length-token '.' fall-through: the dot
          // joins the token that follows
          i += 1
      }
    }
    if (start != i) out += key.substring(start, i)
    if (out.isEmpty) Array(key) else out.toArray
  }

  def render(m: MapData): UTF8String = {
    val n = m.numElements()
    val pairs = new Array[(String, String)](n)
    val ks = m.keyArray
    val vs = m.valueArray
    var i = 0
    while (i < n) {
      pairs(i) = (ks.getUTF8String(i).toString,
        if (vs.isNullAt(i)) "" else vs.getUTF8String(i).toString)
      i += 1
    }
    val sorted = pairs.sortBy(_._1)
    val tokens = sorted.map(p => splitKey(p._1))
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    // stack of currently-open object path segments
    var open: List[String] = Nil
    var first = true
    var j = 0
    while (j < sorted.length) {
      val (key, value) = sorted(j)
      val segs = tokens(j).toList
      // a scalar key shadowed by deeper keys (a, then a.b): object wins.
      // String-sorted extensions of `key` are contiguous right after it;
      // scan them and test TOKEN-level extension (enterprise-id dots
      // make string-prefix alone insufficient).
      val shadowed = {
        var idx = j + 1
        var hit = false
        while (idx < sorted.length && !hit && sorted(idx)._1.startsWith(key)) {
          val t = tokens(idx)
          hit = t.length > segs.length && t.startsWith(segs)
          idx += 1
        }
        hit
      }
      if (!shadowed) {
        val path = segs.dropRight(1)
        val leaf = segs.last
        // close levels not shared with this key's path
        val keep = commonPrefixLen(open, path)
        var toClose = open.length - keep
        while (toClose > 0) { sb.append('}'); toClose -= 1 }
        if (open.length != keep) first = false
        open = open.take(keep)
        if (!first) sb.append(',')
        // open the new levels
        var toOpen = path.drop(keep)
        while (toOpen.nonEmpty) {
          appendJsonString(sb, toOpen.head)
          sb.append(":{")
          open = open :+ toOpen.head
          toOpen = toOpen.tail
          first = true
        }
        appendJsonString(sb, leaf)
        sb.append(':')
        appendJsonValue(sb, value)
        first = false
      }
      j += 1
    }
    var c = open.length
    while (c > 0) { sb.append('}'); c -= 1 }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  private def commonPrefixLen(a: List[String], b: List[String]): Int = {
    var i = 0
    val ai = a.iterator; val bi = b.iterator
    while (ai.hasNext && bi.hasNext && ai.next() == bi.next()) i += 1
    i
  }

  /** Raw-splice marker: a value starting with U+0001 is already JSON
    * (type-hinted number/boolean/list/literal from the value-pairs
    * cmdline, `lib/type-hinting.c`) and is emitted without quoting. */
  final val RawJsonMarker = '\u0001'

  private def appendJsonValue(sb: java.lang.StringBuilder, s: String): Unit =
    if (s.nonEmpty && s.charAt(0) == RawJsonMarker) sb.append(s, 1, s.length)
    else appendJsonString(sb, s)

  private def appendJsonString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b") // named, not  (utf8utils.c:80)
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  def apply(m: Column): Column = apply(m, flat = false)
  def apply(m: Column, flat: Boolean): Column =
    ColumnBridge.column(new FormatJson(ColumnBridge.expression(m), flat))
}
