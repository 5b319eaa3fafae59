package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `pacct_scan(record)` — decode one 64-byte linux `acct_v3` process
  * accounting record, mirroring
  * `/root/reference/modules/pacctformat/pacct-format.c`:
  *
  * struct layout (`linux/acct.h`, native little-endian):
  * `ac_flag u8, ac_version u8, ac_tty u16, ac_exitcode u32, ac_uid u32,
  * ac_gid u32, ac_pid u32, ac_ppid u32, ac_btime u32, ac_etime f32,
  * ac_utime..ac_swaps comp_t u16 ×8, ac_comm char[16]`.
  *
  * Formatting reproduces the reference byte-for-byte, including its
  * quirks: `comp_t` decodes as `(x & 0x1fff) << (((x >> 13) & 7) * 3)`
  * (`PACCT_CONVERT_COMP_TO_ULONG`); **`ac_btime` — a plain u32 — is
  * ALSO pushed through the comp decode** and rendered `"%lu.00"`
  * (pacct-format.c:143 applies `PACCT_CONVERT_COMP_TO_ULONG` to it);
  * `ac_etime` renders `"%9.2f"` (space-padded); `ac_flag` renders
  * `"%02x"`; utime/stime render `"%lu.00"`, the remaining comp fields
  * `"%lu"`; `ac_comm` stops at the first NUL within 16 bytes.
  *
  * Like the reference handler, malformed input still returns a row:
  * a too-short record or a non-v3 version yields the reference's
  * error text in `message` and a null pairs map; well-formed records
  * yield null `message` and the `.pacct.*` pairs
  * (`PACCT_PREFIX`-keyed handles).
  */
case class PacctScan(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PacctScan.schema
  override def prettyName: String = "pacct_scan"

  override protected def nullSafeEval(v: Any): Any =
    PacctScan.scan(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.PacctScan.scan($v);""")

  override protected def withNewChildInternal(c: Expression): PacctScan =
    copy(child = c)
}

object PacctScan {
  def apply(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new PacctScan(ColumnBridge.expression(bytes)))
  }

  val RecordSize = 64

  val schema: StructType = StructType(Seq(
    StructField("message", StringType),
    StructField("pairs", MapType(StringType, StringType, valueContainsNull = false))))

  /** PACCT_CONVERT_COMP_TO_ULONG: 13-bit mantissa, 3-bit base-8 exponent. */
  def compToLong(x: Int): Long = ((x & 0x1fff).toLong) << (((x >> 13) & 0x7) * 3)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  def scan(b: Array[Byte]): InternalRow = {
    if (b.length < RecordSize)
      return InternalRow(UTF8String.fromString(
        s"Error parsing process accounting record, record too small; " +
          s"rec_size='${b.length}', expected_size='$RecordSize'"), null)
    val version = b(1) & 0xff
    if (version != 3)
      return InternalRow(UTF8String.fromString(
        s"Error parsing process accounting record, only the v3 format is " +
          s"supported; version='$version'"), null)

    val keys = new Array[UTF8String](18)
    val vals = new Array[UTF8String](18)
    var i = 0
    def put(k: String, v: String): Unit = {
      keys(i) = UTF8String.fromString(".pacct." + k)
      vals(i) = UTF8String.fromString(v)
      i += 1
    }
    put("ac_flag", f"${b(0) & 0xff}%02x")
    put("ac_tty", u16(b, 2).toString)
    put("ac_exitcode", u32(b, 4).toString)
    put("ac_uid", u32(b, 8).toString)
    put("ac_gid", u32(b, 12).toString)
    put("ac_pid", u32(b, 16).toString)
    put("ac_ppid", u32(b, 20).toString)
    // the reference's btime-through-comp quirk (pacct-format.c:143)
    put("ac_btime", compToLong(u32(b, 24).toInt).toString + ".00")
    val etime = java.lang.Float.intBitsToFloat(u32(b, 28).toInt)
    put("ac_etime", String.format(java.util.Locale.ROOT, "%9.2f",
      java.lang.Double.valueOf(etime.toDouble)))
    put("ac_utime", compToLong(u16(b, 32)).toString + ".00")
    put("ac_stime", compToLong(u16(b, 34)).toString + ".00")
    put("ac_mem", compToLong(u16(b, 36)).toString)
    put("ac_io", compToLong(u16(b, 38)).toString)
    put("ac_rw", compToLong(u16(b, 40)).toString)
    put("ac_minflt", compToLong(u16(b, 42)).toString)
    put("ac_majflt", compToLong(u16(b, 44)).toString)
    put("ac_swaps", compToLong(u16(b, 46)).toString)
    var commLen = 0
    while (commLen < 16 && b(48 + commLen) != 0) commLen += 1
    put("ac_comm", new String(b, 48, commLen, java.nio.charset.StandardCharsets.UTF_8))

    InternalRow(null, new ArrayBasedMapData(
      new GenericArrayData(keys.asInstanceOf[Array[Any]]),
      new GenericArrayData(vals.asInstanceOf[Array[Any]])))
  }

  /** Build one acct_v3 record — the synthesis side for oracles/tests
    * (the inverse of [[scan]]; comp fields must be < 8192 to round-trip
    * identically). */
  def build(flag: Int, tty: Int, exitcode: Long, uid: Long, gid: Long,
      pid: Long, ppid: Long, btime: Long, etime: Float,
      comps: Seq[Int], comm: String): Array[Byte] = {
    require(comps.length == 8, "utime stime mem io rw minflt majflt swaps")
    val bb = java.nio.ByteBuffer.allocate(RecordSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(flag.toByte).put(3.toByte).putShort(tty.toShort)
      .putInt(exitcode.toInt).putInt(uid.toInt).putInt(gid.toInt)
      .putInt(pid.toInt).putInt(ppid.toInt).putInt(btime.toInt)
      .putFloat(etime)
    comps.foreach(c => bb.putShort(c.toShort))
    val cb = comm.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    bb.put(cb, 0, math.min(cb.length, 16))
    bb.array()
  }
}

/** `binary_chunks(bytes, n)` — split a binary blob into fixed-size
  * records, the `log_proto_binary_record_server_new(transport, opts,
  * sizeof(acct_t))` framing of the pacct source
  * (pacct-format.c:166-171): a captured accounting file is a plain
  * concatenation of equal-size structs. A trailing partial record is
  * kept (short — the scan turns it into the record-too-small error
  * row, as the reference would on a truncated read). */
case class BinaryChunks(child: Expression, size: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "binary_chunks"

  override protected def nullSafeEval(v: Any): Any =
    BinaryChunks.chunks(v.asInstanceOf[Array[Byte]], size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.BinaryChunks.chunks($v, $size);""")

  override protected def withNewChildInternal(c: Expression): BinaryChunks =
    copy(child = c)
}

object BinaryChunks {
  def apply(bytes: org.apache.spark.sql.Column, size: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new BinaryChunks(ColumnBridge.expression(bytes), size))
  }

  def chunks(b: Array[Byte], size: Int): GenericArrayData = {
    val n = (b.length + size - 1) / size
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = java.util.Arrays.copyOfRange(b, i * size, math.min((i + 1) * size, b.length))
      i += 1
    }
    new GenericArrayData(out)
  }
}
