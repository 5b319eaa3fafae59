package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `journal_export_scan(content)` — decode a systemd Journal Export
  * Format stream (the `journalctl -o export` wire format, a public
  * spec) into one `map<string,string>` of raw journal fields per entry.
  *
  * This is the capture-file form of the reference's `systemd-journal()`
  * source (`/root/reference/modules/systemd-journal/journal-reader.c`):
  * the reader there walks live sd_journal entries field by field
  * (`journald-helper.c` enumerate), which is exactly the field set the
  * export format serializes. Format rules implemented:
  *
  *  - entries are separated by one empty line;
  *  - a text field is `NAME=value\n` (value newline-free by definition);
  *  - a binary field is `NAME\n` + 64-bit little-endian byte length +
  *    raw payload + `\n` — payload may contain any byte incl. newlines
  *    (values decode as UTF-8, the NV-table convention);
  *  - duplicate field names keep the LAST occurrence, matching
  *    `log_msg_set_value_by_name` overwrite semantics in the reader's
  *    `_handle_data`.
  *
  * Fail-closed on malformation (truncated binary field, length run
  * past EOF, missing trailing newline): entries decoded so far are
  * returned and the remainder of the stream is dropped — the same
  * graceful-abort shape as [[KmsgScan]].
  */
case class JournalExportScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(MapType(StringType, StringType, valueContainsNull = false),
      containsNull = false)
  override def prettyName: String = "journal_export_scan"

  override protected def nullSafeEval(v: Any): Any =
    JournalExportScan.scan(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.JournalExportScan.scan($v);""")

  override protected def withNewChildInternal(c: Expression): JournalExportScan =
    copy(child = c)
}

object JournalExportScan {
  def apply(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new JournalExportScan(ColumnBridge.expression(bytes)))
  }

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  def scan(b: Array[Byte]): GenericArrayData = {
    val entries = new scala.collection.mutable.ArrayBuffer[Any]
    // last-wins per entry, insertion-ordered like the NV table walk
    var fields = new java.util.LinkedHashMap[String, String]
    def flush(): Unit = {
      if (!fields.isEmpty) {
        val n = fields.size
        val ks = new Array[Any](n)
        val vs = new Array[Any](n)
        val it = fields.entrySet().iterator()
        var i = 0
        while (it.hasNext) {
          val e = it.next()
          ks(i) = UTF8String.fromString(e.getKey)
          vs(i) = UTF8String.fromString(e.getValue)
          i += 1
        }
        entries += new ArrayBasedMapData(
          new GenericArrayData(ks), new GenericArrayData(vs))
        fields = new java.util.LinkedHashMap[String, String]
      }
    }
    val len = b.length
    var pos = 0
    var ok = true
    while (ok && pos < len) {
      var nl = pos
      while (nl < len && b(nl) != '\n') nl += 1
      if (nl >= len && nl == pos) { ok = false }       // nothing left
      else if (nl == pos) { flush(); pos = nl + 1 }    // blank line
      else {
        var eq = pos
        while (eq < nl && b(eq) != '=') eq += 1
        if (eq < nl) {                                 // NAME=value
          if (nl >= len) ok = false                    // no trailing \n
          else {
            fields.put(new String(b, pos, eq - pos, Utf8),
              new String(b, eq + 1, nl - eq - 1, Utf8))
            pos = nl + 1
          }
        } else {                                       // binary field
          if (nl + 9 > len) ok = false
          else {
            var size = 0L
            var i = 0
            while (i < 8) {
              size |= (b(nl + 1 + i) & 0xffL) << (8 * i)
              i += 1
            }
            val start = nl + 9
            if (size < 0 || start + size + 1 > len ||
                b((start + size).toInt) != '\n') ok = false
            else {
              fields.put(new String(b, pos, nl - pos, Utf8),
                new String(b, start, size.toInt, Utf8))
              pos = (start + size + 1).toInt
            }
          }
        }
      }
    }
    if (ok) flush()                                    // EOF ends the entry
    new GenericArrayData(entries.toArray)
  }

  /** Serialize entries back to export format — the synthesis side for
    * tests/oracles (inverse of [[scan]]; a value containing `\n` takes
    * the binary form automatically, like `journalctl -o export`). */
  def build(entries: Seq[Seq[(String, String)]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { fields =>
      fields.foreach { case (k, v) =>
        out.write(k.getBytes(Utf8))
        if (v.contains('\n')) {
          out.write('\n')
          val vb = v.getBytes(Utf8)
          var i = 0
          while (i < 8) { out.write(((vb.length.toLong >> (8 * i)) & 0xff).toInt); i += 1 }
          out.write(vb)
        } else {
          out.write('=')
          out.write(v.getBytes(Utf8))
        }
        out.write('\n')
      }
      out.write('\n')
    }
    out.toByteArray
  }
}
