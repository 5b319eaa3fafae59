package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `proxy_proto_header(line)` — PROXY protocol v1 handshake line
  * (`/root/reference/lib/logproto/logproto-proxied-text-server.c`): how
  * client addresses survive a TCP load balancer. The first line of a
  * proxied connection is `PROXY TCP4 <src> <dst> <sport> <dport>`,
  * `PROXY TCP6 ...`, or `PROXY UNKNOWN...`; the reference parses it at
  * handshake and attaches PROXIED_* name-value pairs to every message
  * on the connection.
  *
  * Reference edge semantics preserved (test-proxy-proto.c battery):
  *  - header longer than 2×108 bytes → invalid (`:35,47-56`);
  *  - `PROXY UNKNOWN` prefix: valid, no addresses, params ignored;
  *  - `PROXY TCP4 `/`PROXY TCP6 ` prefix compare is exact — a double
  *    space after PROXY fails, but runs of spaces BETWEEN parameters
  *    collapse (strsplit drops empty tokens, str-utils.h:136-149);
  *  - ≥4 parameters required; extra parameters only warn;
  *  - addresses/ports are NOT validated (C atoi semantics: leading
  *    digit prefix, else 0) — mismatched families, bad octets, and
  *    out-of-range ports are accepted, matching `:71-78`.
  */
case class ProxyProtoHeader(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ProxyProtoHeader.schema
  override def prettyName: String = "proxy_proto_header"

  override protected def nullSafeEval(v: Any): Any =
    ProxyProtoHeader.parse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ProxyProtoHeader.parse($v);")

  override protected def withNewChildInternal(c: Expression): ProxyProtoHeader =
    copy(child = c)
}

object ProxyProtoHeader {
  val schema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("unknown", BooleanType, nullable = false),
    StructField("ip_version", IntegerType, nullable = true),
    StructField("src_ip", StringType, nullable = true),
    StructField("dst_ip", StringType, nullable = true),
    StructField("src_port", IntegerType, nullable = true),
    StructField("dst_port", IntegerType, nullable = true)))

  private val MaxLen = 108 * 2 // PROXY_PROTO_HDR_MAX_LEN (:35)

  /** C atoi: optional sign + longest digit prefix, 0 on no digits. */
  private def atoi(s: String): Int = {
    var i = 0
    var sign = 1
    if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) {
      if (s.charAt(i) == '-') sign = -1
      i += 1
    }
    var v = 0
    var any = false
    while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
      v = v * 10 + (s.charAt(i) - '0'); i += 1; any = true
    }
    if (any) sign * v else 0
  }

  private def invalid: InternalRow =
    new GenericInternalRow(Array[Any](false, false, null, null, null, null, null))

  def parse(lineU: UTF8String): InternalRow = {
    // framing strips the terminator; be lenient about stray \r\n (the
    // reference's WRONG TERMINATION cases are accepted)
    var line = lineU.toString
    while (line.nonEmpty && (line.last == '\n' || line.last == '\r'))
      line = line.substring(0, line.length - 1)
    if (line.length > MaxLen) return invalid
    if (line.startsWith("PROXY UNKNOWN"))
      return new GenericInternalRow(Array[Any](true, true, null, null, null, null, null))
    val ipVersion =
      if (line.startsWith("PROXY TCP4 ")) 4
      else if (line.startsWith("PROXY TCP6 ")) 6
      else return invalid
    val rest = line.substring("PROXY TCPx ".length)
    if (rest.isEmpty) return invalid
    // strsplit semantics: runs of spaces collapse, leading run dropped,
    // a trailing run yields one final (ignored) empty token
    val params = rest.split(" +", 6).filter(_ => true) match {
      case arr if arr.nonEmpty && arr(0).isEmpty => arr.drop(1)
      case arr => arr
    }
    if (params.length < 4) return invalid
    new GenericInternalRow(Array[Any](true, false, ipVersion,
      UTF8String.fromString(params(0)), UTF8String.fromString(params(1)),
      atoi(params(2)), atoi(params(3))))
  }

  def apply(line: Column): Column =
    ColumnBridge.column(ProxyProtoHeader(ColumnBridge.expression(line)))

  /** Strip the handshake line off a whole connection payload:
    * struct(info, body). The reference performs the handshake once per
    * connection and every subsequent line carries the aux data
    * (logproto-proxied-text-server.c:169-186); `body` is that line
    * stream. */
  def stripPayload(payload: Column): Column = {
    import org.apache.spark.sql.functions._
    val nl = locate("\n", payload)
    val firstLine = when(nl === 0, payload)
      .otherwise(payload.substr(lit(1), nl - 1))
    val body = when(nl === 0, lit("")).otherwise(
      payload.substr(nl + 1, length(payload) - nl))
    struct(apply(firstLine).as("info"), body.as("body"))
  }

  /** The PROXIED_* name-value pairs the reference attaches to every
    * message of a successfully proxied connection (empty for
    * PROXY UNKNOWN, matching `_add_aux_data`'s early return). */
  def nvPairs(info: Column): Column = {
    import org.apache.spark.sql.functions._
    when(info.getField("valid") && !info.getField("unknown"),
      map(
        lit("PROXIED_SRCIP"), info.getField("src_ip"),
        lit("PROXIED_DSTIP"), info.getField("dst_ip"),
        lit("PROXIED_SRCPORT"), info.getField("src_port").cast("string"),
        lit("PROXIED_DSTPORT"), info.getField("dst_port").cast("string"),
        lit("PROXIED_IP_VERSION"), info.getField("ip_version").cast("string")))
      .otherwise(map().cast("map<string,string>"))
  }
}
