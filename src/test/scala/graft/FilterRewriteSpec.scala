package graft

import graft.operators.{Filters, Rewrites}
import org.apache.spark.sql.functions._

class FilterRewriteSpec extends GraftSuite {
  import spark.implicits._

  private def logDf = Seq(
    ("h1", "sshd", "login failed from 10.0.1.5", 4, 3, "10.0.1.5"),
    ("h2", "cron", "job done", 9, 6, "192.168.1.1"),
    ("web1", "nginx", "GET /index.html", 1, 4, "10.0.200.7")
  ).toDF("host", "program", "message", "facility", "severity", "srcip")
    .withColumn("tags", array(lit("base")))

  test("facility/severity filters") {
    assert(logDf.filter(Filters.facility("auth")).count() == 1)
    assert(logDf.filter(Filters.severity("err", "warning")).count() == 2)
    assert(logDf.filter(Filters.severityRange("emerg", "err")).count() == 1)
  }

  test("regex and glob matchers") {
    assert(logDf.filter(Filters.program("^ssh")).count() == 1)
    assert(logDf.filter(Filters.message("failed|done")).count() == 2)
    assert(logDf.filter(Filters.matchesGlob("web*", col("host"))).count() == 1)
    assert(logDf.filter(Filters.matchesGlob("h?", col("host"))).count() == 2)
  }

  test("netmask CIDR containment") {
    assert(logDf.filter(Filters.netmask("10.0.0.0/16", col("srcip"))).count() == 2)
    assert(logDf.filter(Filters.netmask("10.0.1.0/24", col("srcip"))).count() == 1)
    assert(logDf.filter(Filters.netmask("0.0.0.0/0", col("srcip"))).count() == 3)
  }

  test("tags filter") {
    val tagged = Rewrites.setTag(logDf, "alert", col("severity") <= 3)
    assert(tagged.filter(Filters.tags("alert")).count() == 1)
    assert(tagged.filter(Filters.tags("base")).count() == 3)
  }

  test("in-list membership and semi-join") {
    assert(logDf.filter(Filters.inList(Seq("sshd", "nginx"), col("program"))).count() == 2)
    val keys = Seq("sshd").toDF("k")
    assert(Filters.inListJoin(logDf, keys, col("program")).count() == 1)
  }

  test("fop_cmp battery from the reference's test_filters_fop_cmp.c") {
    // lib/filter/tests/test_filters_fop_cmp.c: KW_NUM_* = numeric
    // family, KW_* = string family; the documented pivot case is
    // 7 < 10 numerically but "7" < "10" is FALSE as strings
    import graft.operators.Filters
    val row = Seq(7).toDF("level_num")
    def check(t1: String, op: String, t2: String, numeric: Boolean,
        expected: Boolean): Unit = {
      val a = if (t1 == "$LEVEL_NUM") col("level_num").cast("string") else lit(t1)
      val b = lit(t2)
      val c = if (numeric) Filters.numCmp(a, op, b) else Filters.strCmp(a, op, b)
      assert(row.select(c).head.getBoolean(0) == expected,
        s"$t1 $op $t2 numeric=$numeric expected $expected")
    }
    check("$LEVEL_NUM", "eq", "7", numeric = true, expected = true)
    check("$LEVEL_NUM", "ne", "5", numeric = true, expected = true)
    check("$LEVEL_NUM", "lt", "8", numeric = true, expected = true)
    check("$LEVEL_NUM", "lt", "10", numeric = true, expected = true)
    check("$LEVEL_NUM", "lt", "10", numeric = false, expected = false) // "10" < "7" as strings
    check("$LEVEL_NUM", "gt", "5", numeric = true, expected = true)
    check("$LEVEL_NUM", "ge", "7", numeric = true, expected = true)
    check("$LEVEL_NUM", "le", "7", numeric = true, expected = true)
    for ((op, exp) <- Seq("lt" -> true, "le" -> true, "eq" -> false,
        "ne" -> true, "ge" -> false, "gt" -> false))
      check("alma", op, "korte", numeric = false, expected = exp)
    for ((op, exp) <- Seq("lt" -> false, "le" -> false, "eq" -> false,
        "ne" -> true, "ge" -> true, "gt" -> true))
      check("korte", op, "alma", numeric = false, expected = exp)
    for ((op, exp) <- Seq("lt" -> false, "le" -> true, "eq" -> true,
        "ne" -> false, "ge" -> true, "gt" -> false))
      check("alma", op, "alma", numeric = false, expected = exp)
  }

  test("numeric vs string compare semantics") {
    val df = Seq(("9", "10")).toDF("a", "b")
    // string compare: "9" > "10"; numeric compare: 9 < 10 (filter-cmp.c)
    assert(df.filter(Filters.strCmp(col("a"), ">", col("b"))).count() == 1)
    assert(df.filter(Filters.numCmp(col("a"), "<", col("b"))).count() == 1)
  }

  test("rewrite set with condition") {
    val out = Rewrites.set(logDf, "host", lit("REDACTED"), col("facility") === 4)
    assert(out.filter(col("host") === "REDACTED").count() == 1)
    assert(out.filter(col("host") === "h2").count() == 1)
  }

  test("subst first-only vs global") {
    val df = Seq("a-b-c").toDF("message")
    val first = Rewrites.subst(df, "message", "-", "_")
    assert(first.head().getString(0) == "a_b-c")
    val all = Rewrites.subst(df, "message", "-", "_", global = true)
    assert(all.head().getString(0) == "a_b_c")
  }

  test("set-severity / set-pri") {
    val out = Rewrites.setSeverity(logDf, lit("warning"), col("program") === "sshd")
    assert(out.filter(col("severity") === 4).count() == 2)
    val pri = Rewrites.setPri(logDf, lit(165))
    val r = pri.select("facility", "severity").distinct().collect()
    assert(r.forall(row => row.getInt(0) == 20 && row.getInt(1) == 5))
  }

  test("groupset applies to matching map keys only") {
    val df = Seq(1).toDF("x").withColumn("values",
      map(lit("a.x"), lit("1"), lit("a.y"), lit("2"), lit("b.z"), lit("3")))
    val out = Rewrites.groupSet(df, lit("X"), "a.*")
    val m = out.select("values").head().getMap[String, String](0)
    assert(m("a.x") == "X" && m("a.y") == "X" && m("b.z") == "3")
  }

  test("unsetValue removes a dynamic key") {
    val df = Seq(1).toDF("x").withColumn("values",
      map(lit("keep"), lit("1"), lit("drop"), lit("2")))
    val m = Rewrites.unsetValue(df, "drop").select("values")
      .head().getMap[String, String](0)
    assert(m.keySet == Set("keep"))
  }

  test("credit-card-mask masks every card, keeps first6/last4") {
    // scl/rewrite/cc-mask.conf credit-card-mask(): $(substr $1 0 6)
    // ******$(substr $1 -4 4), flags(global) — two cards in one
    // message both mask; the no-card row passes through untouched
    val df = Seq(
      "mc 5400001234567890 then amex 340000123456789 done",
      "jcb 3512345678901234 ok",
      "nothing to see 12345 here").toDF("message")
    val out = Rewrites.creditCardMask(df).collect().map(_.getString(0))
    assert(out(0) == "mc 540000******7890 then amex 340000******6789 done", out(0))
    assert(out(1) == "jcb 351234******1234 ok", out(1))
    assert(out(2) == "nothing to see 12345 here", out(2))
  }

  test("credit-card-hash replaces the card with sha1 --length 16") {
    val card = "5400001234567890"
    val df = Seq(s"pay $card now").toDF("message")
    val got = Rewrites.creditCardHash(df).head().getString(0)
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest(card.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    assert(got == s"pay $sha now", got)
  }

  test("credit-card rewrites at string edges and adjacent matches") {
    // match at start, at end, and back-to-back matches (empty
    // between-segment) all rebuild correctly
    val df = Seq(
      "5400001234567890 leads",
      "trails 5400001234567890",
      "54000012345678905111111111111111").toDF("message")
    val out = Rewrites.creditCardMask(df).collect().map(_.getString(0))
    assert(out(0) == "540000******7890 leads", out(0))
    assert(out(1) == "trails 540000******7890", out(1))
    assert(out(2) == "540000******7890511111******1111", out(2))
  }

  test("config text: credit-card-mask() rewrite block") {
    val cfg = graft.config.ConfigParser.parse("""
      source s { file("/x"); };
      destination d { file("/out"); };
      rewrite r_cc { credit-card-mask(); };
      log { source(s); rewrite(r_cc); destination(d); };
    """)
    val df = Seq(1).toDF("x")
      .withColumn("message", lit("card 340000123456789 used"))
    val routes = graft.config.ConfigCompiler.compile(cfg, Map("s" -> df))
    assert(routes.head.df.select("message").head().getString(0) ==
      "card 340000******6789 used")
  }
}
