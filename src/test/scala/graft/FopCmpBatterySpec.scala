package graft

import graft.config.{ConfigCompiler, ConfigParser}
import graft.template.Template
import org.apache.spark.sql.functions._

/** The comparison-operator battery, ported from
  * `/root/reference/lib/filter/tests/test_filters_fop_cmp.c`: symbolic
  * operators compare numerically (KW_NUM_*), word operators compare as
  * strings (KW_*) — "7 lt 10" is FALSE as a string compare. The test
  * message is `<15>Oct 15 16:17:01 host openvpn[2499]: ...` (severity
  * debug = LEVEL_NUM 7). */
class FopCmpBatterySpec extends GraftSuite {
  import spark.implicits._

  private lazy val frame = Seq(1).toDF("one")
    .withColumn("severity", lit(7))
    .withColumn("facility", lit(1))
    .withColumn("host", lit("host"))
    .withColumn("program", lit("openvpn"))
    .withColumn("pid", lit("2499"))
    .withColumn("message", lit("PTHREAD support initialized"))

  private def eval(lhs: String, op: String, rhs: String): Boolean = {
    val cond = ConfigCompiler.filterColTemplated(
      ConfigParser.parseFilterExpr(s""""$lhs" $op "$rhs""""),
      s => Template.compile(Template.parse(s),
        graft.template.Macros.resolver(frame.columns.toSet, None)))
    frame.select(cond.as("c")).head.getBoolean(0)
  }

  test("symbolic operators compare numerically (fop_cmp:55-63)") {
    assert(eval("$LEVEL_NUM", "==", "7"))
    assert(eval("$LEVEL_NUM", "!=", "5"))
    assert(eval("$LEVEL_NUM", "<", "8"))
    assert(eval("$LEVEL_NUM", "<", "10"))
    assert(eval("$LEVEL_NUM", ">", "5"))
    assert(eval("$LEVEL_NUM", ">=", "7"))
    assert(eval("$LEVEL_NUM", "<=", "7"))
  }

  test("word operators compare as strings: 7 lt 10 is FALSE (fop_cmp:60)") {
    assert(!eval("$LEVEL_NUM", "lt", "10"))
  }

  test("word operators over plain strings (fop_cmp:64-81)") {
    assert(eval("alma", "lt", "korte"))
    assert(eval("alma", "le", "korte"))
    assert(!eval("alma", "eq", "korte"))
    assert(eval("alma", "ne", "korte"))
    assert(!eval("alma", "ge", "korte"))
    assert(!eval("alma", "gt", "korte"))

    assert(!eval("korte", "lt", "alma"))
    assert(!eval("korte", "le", "alma"))
    assert(!eval("korte", "eq", "alma"))
    assert(eval("korte", "ne", "alma"))
    assert(eval("korte", "ge", "alma"))
    assert(eval("korte", "gt", "alma"))

    assert(!eval("alma", "lt", "alma"))
    assert(eval("alma", "le", "alma"))
    assert(eval("alma", "eq", "alma"))
    assert(!eval("alma", "ne", "alma"))
    assert(eval("alma", "ge", "alma"))
    assert(!eval("alma", "gt", "alma"))
  }
}
