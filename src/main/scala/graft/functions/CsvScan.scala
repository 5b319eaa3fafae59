package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `csv_scan(line)` — the reference's CSV scanner as ONE compiled
  * linear pass (`/root/reference/lib/scanner/csv-scanner/csv-scanner.c
  * :139-410`, parser wrapper `modules/csvparser/csvparser.c:136-178`),
  * faithful to the full dialect surface that neither `from_csv`
  * (univocity: single quote pair only) nor a regex split (no quoting)
  * can express together:
  *
  *   - multiple QUOTE PAIRS (`quote-pairs("\"\"[]")`): the opening
  *     char picks its closing mate; text after the close keeps
  *     accumulating unquoted until a delimiter
  *   - dialects: escape-none / escape-backslash (`\x` inside quotes)
  *     / escape-double-char (`''` inside `'...'`) — escapes are only
  *     live INSIDE quotes (csv-scanner.c:179-203)
  *   - delimiter set (any single char) + string delimiters (whole
  *     multi-char strings, matched first)
  *   - flags(strip-whitespace): lstrip AFTER the opening quote,
  *     rstrip of the accumulated value (so quoted whitespace strips
  *     too — csv-scanner.c:171-177,296-309)
  *   - null-value(S): a value equal to S becomes the EMPTY string
  *     (not SQL null — csv-scanner.c:310-316)
  *   - flags(greedy): the last column takes the raw rest, with NO
  *     strip/null translation (csv_scanner_scan_next:362-370)
  *   - drop-invalid: row nulls out unless the scan is COMPLETE — all
  *     input consumed AND every column filled (csvparser.c:164,
  *     csv_scanner_is_scan_complete)
  *
  * Returns `struct<c1 string, ..., valid boolean>`: scanned-but-empty
  * values are "", columns past the input end are null (the reference
  * leaves those NV pairs unset), `valid` = scan-complete.
  */
case class CsvScan(child: Expression, columns: Seq[String],
    delimiters: String, stringDelims: Seq[String], quotePairs: String,
    dialect: String, greedy: Boolean, stripWhitespace: Boolean,
    nullValue: String) extends UnaryExpression {

  require(Seq("none", "backslash", "double-char").contains(dialect),
    s"csv_scan dialect: $dialect")

  override def dataType: DataType = StructType(
    columns.map(StructField(_, StringType)) :+
      StructField("valid", BooleanType, nullable = false))

  override def prettyName: String = "csv_scan"

  @transient private lazy val quoteStart: Array[Char] =
    quotePairs.grouped(2).map(_.charAt(0)).toArray
  @transient private lazy val quoteEnd: Array[Char] =
    quotePairs.grouped(2).map(p => p.charAt(p.length - 1)).toArray

  private def isWs(c: Char): Boolean = c == ' ' || c == '\t'

  def scan(line: UTF8String): InternalRow = {
    val s = line.toString
    val n = s.length
    val out = new Array[Any](columns.length + 1)
    var pos = 0
    var col = 0
    var partial = false
    val sb = new java.lang.StringBuilder
    while (col < columns.length && !partial) {
      if (col == columns.length - 1 && greedy) {
        // greedy last column: raw rest, no strip/null translation
        out(col) = UTF8String.fromString(s.substring(pos))
        pos = n
        col += 1
      } else if (pos >= n) {
        partial = true // real column with no input left: stays unset
      } else {
        sb.setLength(0)
        // opening quote BEFORE the left-strip
        var quote: Char = 0
        val qi = quoteStart.indexOf(s.charAt(pos))
        if (qi >= 0) { quote = quoteEnd(qi); pos += 1 }
        if (stripWhitespace) while (pos < n && isWs(s.charAt(pos))) pos += 1
        var break = false
        while (pos < n && !break) {
          val c = s.charAt(pos)
          if (quote != 0) {
            if (dialect == "backslash" && c == '\\' && pos + 1 < n) {
              sb.append(s.charAt(pos + 1)); pos += 2
            } else if (dialect == "double-char" && c == quote &&
                pos + 1 < n && s.charAt(pos + 1) == quote) {
              sb.append(quote); pos += 2
            } else if (c == quote) {
              quote = 0; pos += 1
            } else { sb.append(c); pos += 1 }
          } else {
            // string delimiters match first, then the char set
            val sd = stringDelims.find(d => s.startsWith(d, pos))
            if (sd.isDefined) { pos += sd.get.length; break = true }
            else if (delimiters.indexOf(c) >= 0) { pos += 1; break = true }
            else { sb.append(c); pos += 1 }
          }
        }
        var len = sb.length
        if (stripWhitespace) while (len > 0 && isWs(sb.charAt(len - 1))) len -= 1
        sb.setLength(len)
        var v = sb.toString
        if (nullValue != null && v == nullValue) v = ""
        out(col) = UTF8String.fromString(v)
        col += 1
      }
    }
    // is_scan_complete: all input consumed and the column walk FINISHED
    // (a partial column keeps the state short of FINISH)
    out(columns.length) = pos >= n && !partial && col == columns.length
    InternalRow.fromSeq(out.toIndexedSeq)
  }

  override protected def nullSafeEval(v: Any): Any =
    scan(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cs", this, classOf[CsvScan].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.scan($v);")
  }

  override protected def withNewChildInternal(c: Expression): CsvScan =
    copy(child = c)
}

object CsvScan {
  def apply(line: Column, columns: Seq[String], delimiters: String = ",",
      stringDelims: Seq[String] = Nil, quotePairs: String = "\"\"''",
      dialect: String = "double-char", greedy: Boolean = false,
      stripWhitespace: Boolean = false,
      nullValue: Option[String] = None): Column =
    ColumnBridge.column(new CsvScan(ColumnBridge.expression(line), columns,
      delimiters, stringDelims, quotePairs, dialect, greedy,
      stripWhitespace, nullValue.orNull))
}
