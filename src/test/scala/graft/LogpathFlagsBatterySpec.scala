package graft

import graft.config.{ConfigCompiler, ConfigParser}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Verbatim port of the reference's python-functional logpath flag
  * matrix (`/root/reference/tests/python_functional/functional_tests/
  * logpath/test_flags_{catch_all,fallback,final}.py`,
  * `test_multiple_embedded_logpaths.py`, `test_multiple_flags.py`) —
  * the routing algebra (§2.6) driven END-TO-END through the compiled
  * config path: config text with embedded `log {}` statements in,
  * per-destination row sets out. The python harness feeds BSD lines
  * through a file source and asserts which formatted messages appear
  * in which output file; here the source frame carries the
  * already-parsed (host, program, message) columns (keep_hostname=yes)
  * and the assertions check the same membership matrix.
  */
class LogpathFlagsBatterySpec extends GraftSuite {
  import spark.implicits._

  /** The four-message input of the multiple_* tests (host × program). */
  private def messages(rows: (String, String)*): DataFrame =
    rows.zipWithIndex.map { case ((h, p), i) =>
      (i.toLong, h, p, s"message from $h and $p")
    }.toDF("id", "host", "program", "message")

  /** Compile and read one destination's delivered id set. */
  private def delivered(cfg: String, src: DataFrame): Map[String, Set[Long]] = {
    val routes = ConfigCompiler.compile(ConfigParser.parse(cfg),
      Map("s_file" -> src))
    routes.groupBy(_.destination).map { case (n, rs) =>
      n -> rs.flatMap(_.df.select("id").as[Long].collect()).toSet
    }
  }

  test("test_flags_catch_all: a source-less catch-all path sees every " +
      "source; the inner path still delivers") {
    val cfg = """
      source s_file { file("/in"); };
      destination d_file1 { file("/out1"); };
      destination d_catch { file("/outc"); };
      log {
        source(s_file);
        log { destination(d_file1); };
      };
      log { destination(d_catch); flags(catch-all); };
    """
    val src = messages(("host-A", "testprogram"))
    val got = delivered(cfg, src)
    assert(got("d_file1") == Set(0L))
    assert(got("d_catch") == Set(0L))
  }

  test("test_flags_fallback: the fallback inner path receives only " +
      "messages matched by no sibling") {
    val cfg = """
      source s_file { file("/in"); };
      filter f_host { host("host-A"); };
      destination d_file1 { file("/out1"); };
      destination d_file2 { file("/out2"); };
      log {
        source(s_file);
        log { filter(f_host); destination(d_file1); };
        log { destination(d_file2); flags(fallback); };
      };
    """
    val src = messages(("host-A", "p"), ("host-B", "p"))
    val got = delivered(cfg, src)
    assert(got("d_file1") == Set(0L))
    assert(got("d_file2") == Set(1L))
  }

  test("test_flags_final: a final inner path stops matched messages " +
      "from reaching later siblings") {
    val cfg = """
      source s_file { file("/in"); };
      filter f_host { host("host-A"); };
      destination d_file1 { file("/out1"); };
      destination d_file2 { file("/out2"); };
      log {
        source(s_file);
        log { filter(f_host); destination(d_file1); flags(final); };
        log { destination(d_file2); };
      };
    """
    val src = messages(("host-A", "p"), ("host-B", "p"))
    val got = delivered(cfg, src)
    assert(got("d_file1") == Set(0L))
    assert(got("d_file2") == Set(1L))
  }

  test("test_multiple_embedded_logpaths: flag-less siblings " +
      "multi-deliver; a source-less path without catch-all gets NOTHING") {
    val cfg = """
      source s_file { file("/in"); };
      filter f_host { host("host-A"); };
      filter f_prog { program("app-A"); };
      destination d1 { file("/o1"); };
      destination d2 { file("/o2"); };
      destination d3 { file("/o3"); };
      destination d4 { file("/o4"); };
      log {
        source(s_file);
        log { filter(f_host); destination(d1); };
        log { filter(f_prog); destination(d2); };
        log { destination(d3); };
      };
      log { destination(d4); };
    """
    val src = messages(("host-A", "app-A"), ("host-A", "app-B"),
      ("host-B", "app-A"), ("host-B", "app-B"))
    val got = delivered(cfg, src)
    assert(got("d1") == Set(0L, 1L)) // host-A matches msgs 1,2
    assert(got("d2") == Set(0L, 2L)) // app-A matches msgs 1,3
    assert(got("d3") == Set(0L, 1L, 2L, 3L)) // no filter: everything
    assert(got("d4") == Set.empty) // no source, no catch-all
  }

  test("test_multiple_flags: final + unflagged + fallback siblings and " +
      "a catch-all path compose") {
    val cfg = """
      source s_file { file("/in"); };
      filter f_host { host("host-A"); };
      filter f_prog { program("app-A"); };
      destination d1 { file("/o1"); };
      destination d2 { file("/o2"); };
      destination d3 { file("/o3"); };
      destination d4 { file("/o4"); };
      log {
        source(s_file);
        log { filter(f_host); destination(d1); flags(final); };
        log { filter(f_prog); destination(d2); };
        log { destination(d3); flags(fallback); };
      };
      log { destination(d4); flags(catch-all); };
    """
    val src = messages(("host-A", "app-A"), ("host-A", "app-B"),
      ("host-B", "app-A"), ("host-B", "app-B"))
    val got = delivered(cfg, src)
    // host-A final takes msgs 1,2 and BLOCKS them from later siblings
    assert(got("d1") == Set(0L, 1L))
    // program(app-A) matches 1,3 but msg 1 was finalized upstream
    assert(got("d2") == Set(2L))
    // fallback: only msg 4 matched no sibling
    assert(got("d3") == Set(3L))
    // catch-all sees everything regardless
    assert(got("d4") == Set(0L, 1L, 2L, 3L))
  }

  test("embedded log {} forks are only legal as the final junction " +
      "(cfg-grammar.y log_content, ADVICE r11)") {
    // interleaved: log{}; filter(); log{}; is a reference syntax error
    // — accepting it would invent novel two-junction semantics
    val interleaved = """
      source s_file { file("/in"); };
      filter f { host("h"); };
      destination d1 { file("/o1"); };
      destination d2 { file("/o2"); };
      log {
        source(s_file);
        log { destination(d1); };
        filter(f);
        log { destination(d2); };
      };
    """
    val e = intercept[ConfigParser.ParseError] { ConfigParser.parse(interleaved) }
    assert(e.getMessage.contains("final junction"))
    // a fork AFTER the trailing flags() is likewise out of grammar
    val afterFlags = """
      source s_file { file("/in"); };
      destination d1 { file("/o1"); };
      destination d2 { file("/o2"); };
      log {
        source(s_file);
        log { destination(d1); };
        flags(flow-control);
        log { destination(d2); };
      };
    """
    intercept[ConfigParser.ParseError] { ConfigParser.parse(afterFlags) }
    // trailing group + flags stays legal, and channel{} is a legal
    // fork keyword (log_fork: KW_LOG | KW_CHANNEL)
    val legal = """
      source s_file { file("/in"); };
      destination d1 { file("/o1"); };
      destination d2 { file("/o2"); };
      log {
        source(s_file);
        log { destination(d1); };
        channel { destination(d2); };
        flags(flow-control);
      };
    """
    val src = messages(("host-A", "p"), ("host-B", "p"))
    val got = delivered(legal, src)
    assert(got("d1") == Set(0L, 1L))
    assert(got("d2") == Set(0L, 1L))
  }
}
