package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `parse_syslog(line, refYear)` — parse an RFC3164/RFC5424 line into a
  * struct (see [[graft.model.LogSchema.parsedSchema]]).
  *
  * Semantics follow `/root/reference/modules/syslogformat/syslog-format.c`.
  * Codegen emits one static call so the expression stays inside
  * whole-stage codegen (no interpreted fallback on the hot path).
  */
case class ParseSyslog(line: Expression, refYear: Expression)
    extends BinaryExpression {
  override def left: Expression = line
  override def right: Expression = refYear
  override def dataType: DataType = graft.model.LogSchema.parsedSchema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "parse_syslog"

  override protected def nullSafeEval(l: Any, y: Any): Any =
    SyslogLineParser.parseRow(l.asInstanceOf[UTF8String], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, y) =>
      s"${ev.value} = graft.functions.SyslogLineParser.parseRow($l, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ParseSyslog =
    copy(line = newLeft, refYear = newRight)
}

/** `ipv4_to_int(ip)` — dotted-quad to uint32 (as long), like the
  * reference's `$(ipv4-to-int)` (`/root/reference/modules/basicfuncs/
  * ip-funcs.c`). Null on malformed input. */
case class Ipv4ToInt(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ipv4_to_int"

  override protected def nullSafeEval(v: Any): Any = {
    val r = Ipv4ToInt.toLong(v.asInstanceOf[UTF8String])
    if (r < 0) null else java.lang.Long.valueOf(r)
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.Ipv4ToInt.toLong($v);
         |if (${ev.value} < 0) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Ipv4ToInt = copy(c)
}

object Ipv4ToInt {
  /** Returns -1 on malformed input (valid results are in [0, 2^32)).
    * (Named `toLong`, not `eval`: a companion method named like the
    * instance `eval(InternalRow)` gets no static forwarder, which breaks
    * the generated java.) */
  def toLong(ip: UTF8String): Long = {
    val s = ip.toString
    var acc = 0L; var octet = -1L; var parts = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch >= '0' && ch <= '9') {
        octet = (if (octet < 0) 0 else octet) * 10 + (ch - '0')
        if (octet > 255) return -1L
      } else if (ch == '.') {
        if (octet < 0 || parts == 3) return -1L
        acc = (acc << 8) | octet; octet = -1; parts += 1
      } else return -1L
      i += 1
    }
    if (octet < 0 || parts != 3) return -1L
    (acc << 8) | octet
  }
}

/** Column builders + SQL registration for graft's custom expressions. */
object GraftFunctions {
  import org.apache.spark.sql.functions.lit

  def parse_syslog(line: Column, refYear: Int = 2024): Column =
    ColumnBridge.column(ParseSyslog(
      ColumnBridge.expression(line),
      ColumnBridge.expression(lit(refYear))))

  def ipv4_to_int(ip: Column): Column =
    ColumnBridge.column(Ipv4ToInt(ColumnBridge.expression(ip)))

  /** Register SQL names (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("parse_syslog", {
      case Seq(l) => ParseSyslog(l, Literal(2024))
      case Seq(l, y) => ParseSyslog(l, y)
      case _ => throw new IllegalArgumentException("parse_syslog(line[, refYear])")
    }, "built-in")
    reg.createOrReplaceTempFunction("ipv4_to_int",
      exprs => Ipv4ToInt(exprs.head), "built-in")
  }
}
