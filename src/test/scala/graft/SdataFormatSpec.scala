package graft

import graft.operators.Scl
import org.apache.spark.sql.functions._

/** SDATA name sanitization battery, ported from
  * `/root/reference/lib/logmsg/tests/test_log_message.c`
  * test_sdata_sanitization: SD-NAMEs percent-encode non-ASCII bytes
  * and the structurally unsafe chars, values escape with backslashes.
  * (Block ordering here is the engine's deterministic sort, vs the
  * reference's newest-block-first insertion order — a declared
  * divergence; single-block cases are order-free.) */
class SdataFormatSpec extends GraftSuite {
  import spark.implicits._

  private def sdata(kv: (String, String)*): String = {
    val df = Seq(1).toDF("one")
      .withColumn("values", map(kv.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))
    df.select(Scl.sdataBlocks(df).cast("string")).head.getString(0)
  }

  test("sd-param names percent-encode unsafe chars (test_log_message.c:373-414)") {
    assert(sdata(".SDATA.foo.bar[0]" -> "value[0]") ==
      "[foo bar%5B0%5D=\"value[0\\]\"]")
    assert(sdata(".SDATA.foo.bácsi" -> "bácsi") ==
      "[foo b%C3%A1csi=\"bácsi\"]")
    assert(sdata(".SDATA.foo.sp ace" -> "sp ace") ==
      "[foo sp%20ace=\"sp ace\"]")
    assert(sdata(".SDATA.foo.eq=al" -> "eq=al") ==
      "[foo eq%3Dal=\"eq=al\"]")
    assert(sdata(".SDATA.foo.quo\"te" -> "quo\"te") ==
      "[foo quo%22te=\"quo\\\"te\"]")
  }

  test("sd-id names sanitize with the same function (test_log_message.c:411-414)") {
    assert(sdata(".SDATA.fo@o[0].bar" -> "value") ==
      "[fo@o%5B0%5D bar=\"value\"]")
  }

  test("multiple params group under one block (test_log_message.c:416-433)") {
    assert(sdata(
      ".SDATA.foo.bar1" -> "value",
      ".SDATA.foo.bar2" -> "value",
      ".SDATA.foo.bar3" -> "value") ==
      "[foo bar1=\"value\" bar2=\"value\" bar3=\"value\"]")
    // two blocks — engine renders name-sorted
    assert(sdata(
      ".SDATA.post.value1" -> "value",
      ".SDATA.foo.bar1" -> "value") ==
      "[foo bar1=\"value\"][post value1=\"value\"]")
  }
}
