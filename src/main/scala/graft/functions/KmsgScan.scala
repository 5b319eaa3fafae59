package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** `kmsg_scan(record)` — one-pass parse of a linux 3.5+ `/dev/kmsg`
  * record, mirroring
  * `/root/reference/modules/linux-kmsg-format/linux-kmsg-format.c`:
  *
  * ```
  * 6,802,65338577[,extra];ATL1E 0000:02:00.0: eth0: NIC Link is Up
  *  SUBSYSTEM=pci
  *  DEVICE=+pci:0000:02:00.0
  * ```
  *
  * `pri,seq,usec-since-boot[,ignored...];message`, then one
  * whitespace-led `KEY=value` line per kernel-attached pair. Faithful
  * quirks kept: a non-digit inside the seq run aborts the seq
  * gracefully (no MSGID, scan resumes one past the offender —
  * `kmsg_parse_seq` returns TRUE early and the caller still `pos++`es);
  * extra comma fields before `;` are skipped (`kmsg_skip_to_message`);
  * a record ending without a trailing newline terminates the message /
  * last value at end-of-data (the reference trims trailing `\n`/NUL
  * then relies on the trimmed byte sitting one past `length`).
  *
  * `DEVICE=` values are decomposed exactly like
  * `kmsg_parse_device_key_value_pair`: `b12:1` → block major/minor,
  * `c3:4` → char major/minor, `n6` → netdev index, `+acpi:PNP0A08:00`
  * → subsystem type/name, anything else → type `<unknown>` + name.
  * Pair keys land under `.linux.<KEY>` / `.linux.DEVICE.*` /
  * `.linux.timestamp`, matching `linux_msg_format_init`'s handles.
  *
  * `stamp_usec` = `bootUsec` + the monotonic usec field
  * (`kmsg_to_absolute_time`); the caller supplies boot time — the
  * reference reads `/proc/uptime` at init, we keep the expression
  * deterministic.
  */
case class KmsgScan(child: Expression, bootUsec: Long) extends UnaryExpression {

  override def dataType: DataType = KmsgScan.schema
  override def prettyName: String = "kmsg_scan"

  override protected def nullSafeEval(v: Any): Any =
    KmsgScan.scan(v.asInstanceOf[UTF8String], bootUsec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.KmsgScan.scan($v, ${bootUsec}L);""")

  override protected def withNewChildInternal(c: Expression): KmsgScan =
    copy(child = c)
}

object KmsgScan {
  def apply(text: org.apache.spark.sql.Column, bootUsec: Long = 0L): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new KmsgScan(ColumnBridge.expression(text), bootUsec))
  }

  val schema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("pri", IntegerType),
    StructField("msgid", StringType),
    StructField("message", StringType),
    StructField("stamp_usec", LongType),
    StructField("pairs", MapType(StringType, StringType, valueContainsNull = false))))

  private val failed: InternalRow = InternalRow(false, null, null, null, null, null)

  def scan(u: UTF8String, bootUsec: Long): InternalRow = {
    val raw = u.toString
    // linux_kmsg_format_handler: strip trailing '\n' / NUL before parsing
    var len = raw.length
    while (len > 0 && (raw.charAt(len - 1) == '\n' || raw.charAt(len - 1) == '\u0000')) len -= 1
    val s = raw.substring(0, len)
    var pos = 0

    // kmsg_parse_prio: digits until ','; any other char fails
    var pri = 0
    while (pos < len && s.charAt(pos) != ',') {
      val c = s.charAt(pos)
      if (c < '0' || c > '9') return failed
      pri = pri * 10 + (c - '0')
      pos += 1
    }
    if (pos >= len) return failed
    pos += 1

    // kmsg_parse_seq: digits until ','; first non-digit aborts gracefully
    // (no MSGID, and the caller's pos++ skips the offending char)
    var msgid: String = null
    var seqDone = false
    val seqStart = pos
    while (!seqDone && pos < len && s.charAt(pos) != ',') {
      val c = s.charAt(pos)
      if (c < '0' || c > '9') seqDone = true else pos += 1
    }
    if (!seqDone) {
      if (pos >= len) return failed
      msgid = s.substring(seqStart, pos)
    }
    pos += 1

    // kmsg_parse_timestamp: digits until ',' or ';'
    var ts = 0L
    val tsStart = pos
    while (pos < len && s.charAt(pos) != ',' && s.charAt(pos) != ';') {
      val c = s.charAt(pos)
      if (c < '0' || c > '9') return failed
      ts = ts * 10L + (c - '0')
      pos += 1
    }
    if (pos >= len) return failed
    val tsStr = s.substring(tsStart, pos)

    // kmsg_skip_to_message: ignore any future comma-separated extras
    while (pos < len && s.charAt(pos) != ';') pos += 1
    if (pos >= len) return failed
    pos += 1

    // kmsg_parse_message: until '\n' or end-of-record (trimmed-newline quirk)
    val msgStart = pos
    while (pos < len && s.charAt(pos) != '\n') pos += 1
    val message = s.substring(msgStart, pos)

    val keys = new ArrayBuffer[UTF8String](4)
    val vals = new ArrayBuffer[UTF8String](4)
    def put(k: String, v: String): Unit = {
      keys += UTF8String.fromString(k); vals += UTF8String.fromString(v)
    }
    put(".linux.timestamp", tsStr)

    // kmsg_parse_key_value_pair loop over the continuation lines
    // (log_msg_parse_kmsg: `if (pos + 1 >= length) return TRUE`)
    while (pos + 1 < len) {
      pos += 1 // skip '\n'
      while (pos < len && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t')) pos += 1
      if (pos >= len) return failed
      val nameStart = pos
      while (pos < len && s.charAt(pos) != '=') pos += 1
      if (pos >= len) return failed
      val name = s.substring(nameStart, pos)
      pos += 1
      val valStart = pos
      while (pos < len && s.charAt(pos) != '\n') pos += 1
      val value = s.substring(valStart, pos)

      if (name == "DEVICE") {
        // kmsg_parse_device_key_value_pair
        if (value.isEmpty) { put(".linux.DEVICE.type", "<unknown>"); put(".linux.DEVICE.name", "") }
        else value.charAt(0) match {
          case 'b' | 'c' =>
            put(".linux.DEVICE.type", if (value.charAt(0) == 'b') "block" else "char")
            val body = value.substring(1)
            val sep = body.indexOf(':')
            if (sep < 0) { put(".linux.DEVICE.major", body); put(".linux.DEVICE.minor", "") }
            else { put(".linux.DEVICE.major", body.substring(0, sep)); put(".linux.DEVICE.minor", body.substring(sep + 1)) }
          case 'n' =>
            put(".linux.DEVICE.type", "netdev")
            put(".linux.DEVICE.index", value.substring(1))
          case '+' =>
            val body = value.substring(1)
            val sep = body.indexOf(':')
            if (sep < 0) { put(".linux.DEVICE.type", body); put(".linux.DEVICE.name", "") }
            else { put(".linux.DEVICE.type", body.substring(0, sep)); put(".linux.DEVICE.name", body.substring(sep + 1)) }
          case _ =>
            put(".linux.DEVICE.type", "<unknown>")
            put(".linux.DEVICE.name", value)
        }
      } else put(".linux." + name, value)
    }

    InternalRow(true, pri, if (msgid == null) null else UTF8String.fromString(msgid),
      UTF8String.fromString(message), bootUsec + ts,
      new ArrayBasedMapData(new GenericArrayData(keys.toArray[Any]),
        new GenericArrayData(vals.toArray[Any])))
  }
}
