package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `framed_records(payload)` — RFC6587 octet-counted framing
  * (`/root/reference/lib/logproto/logproto-framed-server.c`): a payload
  * is a run of `NNN <bytes>` frames — decimal byte count (max 10
  * digits, `:150`), one space, exactly NNN payload bytes. This is the
  * standard syslog-over-TCP relay framing, so it is how whole payloads
  * arrive via Kafka or file capture.
  *
  * Reference edge semantics preserved:
  *  - invalid frame header (non-digit before the space, or >10 digits)
  *    aborts the stream (`LPS_ERROR`, `:242-248`) — frames already
  *    extracted are kept, the rest of the payload is dropped;
  *  - a frame longer than `maxMsgSize` is trimmed to the first
  *    `maxMsgSize` bytes when `trimLargeMessages` (the reference's
  *    trim path `:259-267`), else aborts like the error path;
  *  - a trailing partial frame (header or body) is dropped — in the
  *    socket server it would wait for more data; a finished payload
  *    has no more data.
  */
case class FramedRecords(child: Expression, maxMsgSize: Int = 65536,
    trimLargeMessages: Boolean = true) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "framed_records"

  override protected def nullSafeEval(v: Any): Any =
    FramedRecords.split(v.asInstanceOf[UTF8String], maxMsgSize, trimLargeMessages)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.FramedRecords.split($v, $maxMsgSize, $trimLargeMessages);")

  override protected def withNewChildInternal(c: Expression): FramedRecords =
    copy(child = c)
}

object FramedRecords {
  private val MaxFrameLenDigits = 10

  def split(payload: UTF8String, maxMsgSize: Int, trim: Boolean): ArrayData = {
    val b = payload.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    var ok = true
    while (ok && i < b.length) {
      // frame header: decimal digits then one space
      var len = 0L
      var j = i
      while (j < b.length && b(j) >= '0' && b(j) <= '9' && j - i < MaxFrameLenDigits)  {
        len = len * 10 + (b(j) - '0'); j += 1
      }
      if (j >= b.length) { ok = false } // partial header at end: drop
      else if (j == i || b(j) != ' ') { ok = false } // invalid header: abort
      else {
        val start = j + 1
        if (len > maxMsgSize && !trim) ok = false
        else if (start + len > b.length) ok = false // partial body: drop
        else {
          val keep = math.min(len, maxMsgSize.toLong).toInt
          out += UTF8String.fromBytes(b, start, keep)
          i = (start + len).toInt
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  def apply(payload: Column, maxMsgSize: Int, trimLargeMessages: Boolean): Column =
    ColumnBridge.column(new FramedRecords(
      ColumnBridge.expression(payload), maxMsgSize, trimLargeMessages))
}
