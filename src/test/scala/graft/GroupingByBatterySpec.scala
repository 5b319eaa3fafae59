package graft

import graft.config.{ConfigCompiler, ConfigParser}
import graft.operators.Sessions
import org.apache.spark.sql.functions._

/** Port of `/root/reference/modules/dbparser/tests/test_grouping_by.c`
  * (create/init lifecycle + both persist-name cases) plus the init
  * validation it exercises implicitly through grouping_by_init
  * (groupingby.c:510-532) and the persist-name 512-byte buffer quirk
  * (groupingby.c:363-369). State-restore BEHAVIOR across a restart is
  * covered by StreamingSpec ("checkpoint restart: grouping-by sessions
  * survive a stream restart"); this battery pins the IDENTITY rules
  * that select which state a reloaded config resumes.
  */
class GroupingByBatterySpec extends GraftSuite {
  import spark.implicits._

  private def ev = Seq(("h1", "m1", 100L), ("h1", "m2", 200L))
    .toDF("host", "message", "sec")
    .withColumn("ts", timestamp_seconds(col("sec")))
    .withColumn("tags", array().cast("array<string>"))

  private def compile(parser: String) = {
    val cfg = ConfigParser.parse(s"""
      source s { file("/x"); };
      parser p { $parser };
      destination d { file("/out"); };
      log { source(s); parser(p); destination(d); };
    """)
    ConfigCompiler.compile(cfg, Map("s" -> ev)).head.df
  }

  test("create_grouping_by: aggregate + timeout(1) + key initializes and runs (test_grouping_by.c:40-59)") {
    val out = compile("""grouping-by(key("$HOST") timeout(1)
      aggregate(value("n" "$(context-length)")));""")
    // timeout(1) with a 100 s gap: the two h1 rows land in two sessions
    assert(out.count() == 2)
    assert(out.select("n").as[String].collect().toSeq == Seq("1", "1"))
  }

  test("init validation: aggregate/timeout/key each mandatory, reference order + messages (groupingby.c:510-532)") {
    // aggregate() missing fires FIRST (even with everything else wrong)
    val e1 = intercept[IllegalArgumentException] {
      compile("""grouping-by();""")
    }
    assert(e1.getMessage == "The aggregate() option for grouping-by() is mandatory")
    // timeout checks after aggregate: missing == the C default -1
    val e2 = intercept[IllegalArgumentException] {
      compile("""grouping-by(aggregate(value("n" "$(context-length)")));""")
    }
    assert(e2.getMessage ==
      "timeout() needs to be specified explicitly and must be greater than 0 in the grouping-by() parser")
    // explicit zero is rejected the same way (< 1)
    val e3 = intercept[IllegalArgumentException] {
      compile("""grouping-by(timeout(0)
        aggregate(value("n" "$(context-length)")));""")
    }
    assert(e3.getMessage.contains("greater than 0"))
    // key() is the last check
    val e4 = intercept[IllegalArgumentException] {
      compile("""grouping-by(timeout(5)
        aggregate(value("n" "$(context-length)")));""")
    }
    assert(e4.getMessage == "The key() option is mandatory for the grouping-by() parser")
  }

  test("cfg_persist_name_not_equal (test_grouping_by.c:61-85)") {
    assert(Sessions.persistName("$TEMPLATE1") != Sessions.persistName("$TEMPLATE2"))
  }

  test("cfg_persist_name_equal (test_grouping_by.c:87-111)") {
    assert(Sessions.persistName("$TEMPLATE1") == Sessions.persistName("$TEMPLATE1"))
    assert(Sessions.persistName("$TEMPLATE1") == "grouping-by($TEMPLATE1)")
  }

  test("persist name truncates at the 512-byte g_snprintf buffer (groupingby.c:365-368)") {
    // names sharing a 511-byte prefix COLLIDE — the reference renders
    // into a static 512-byte buffer, so the tail never reaches the name
    val base = "x" * 600
    val a = Sessions.persistName(base + "AAA")
    val b = Sessions.persistName(base + "BBB")
    assert(a == b)
    assert(a.getBytes("UTF-8").length == 511)
    // and below the buffer bound the tail still distinguishes
    val short = "y" * 400
    assert(Sessions.persistName(short + "A") != Sessions.persistName(short + "B"))
  }

  test("persist identity is the raw BYTE prefix: a multi-byte char split at byte 511 keeps names distinct like the C buffer") {
    // "grouping-by(" = 12 bytes + 497 'x' = 509; the 3-byte char sits at
    // offsets 509-511, so truncation keeps its first TWO bytes. € (E2 82
    // AC) vs ↑ (E2 86 91) differ in the KEPT second byte — the C buffer
    // keeps them distinct, but both decoded Strings end in one U+FFFD
    // and compare equal. Identity must therefore be the bytes.
    val t1 = "x" * 497 + "€" + "tail1"
    val t2 = "x" * 497 + "↑" + "tail2"
    assert(Sessions.persistName(t1) == Sessions.persistName(t2)) // display collides
    assert(!java.util.Arrays.equals(
      Sessions.persistNameBytes(t1), Sessions.persistNameBytes(t2)))
    assert(Sessions.persistCheckpoint("/ckpt", t1) !=
      Sessions.persistCheckpoint("/ckpt", t2))
    assert(Sessions.persistNameBytes(t1).length == 511)
  }

  test("persist checkpoint: reload with the same key template resumes the same state path, a changed template gets a fresh one") {
    val p1 = Sessions.persistCheckpoint("/ckpt", "$HOST")
    val p2 = Sessions.persistCheckpoint("/ckpt", "$HOST")
    val p3 = Sessions.persistCheckpoint("/ckpt", "$PROGRAM")
    assert(p1 == p2 && p1 != p3)
    assert(p1.startsWith("/ckpt/"))
    // sanitization cannot alias distinct names (md5 suffix keeps
    // injectivity even when the safe prefix collides)
    val q1 = Sessions.persistCheckpoint("/ckpt", "$A/B")
    val q2 = Sessions.persistCheckpoint("/ckpt", "$A_B")
    assert(q1 != q2)
  }
}
