package graft

import graft.config.{CfgLexerSubst, ConfigCompiler, ConfigParser}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The backtick-substitution battery, ported from
  * `/root/reference/lib/tests/test_cfg_lexer_subst.c` (args >
  * defaults > globals > env resolution, string-state tracking, quoted
  * value splicing, the reference's exact error texts), plus e2e
  * `@define` + use-site coverage through the config front end.
  */
class CfgLexerSubstSpec extends AnyFunSuite {

  // construct_cfg_args_for_args / _defaults / _globals (the C fixture)
  private val args = Map(
    "arg" -> "arg_value",
    "simple_string" -> "\"simple_string_value\"",
    "simple_qstring" -> "'simple_qstring_value'",
    "escaped_string" -> "\"escaped_string\\\"\\r\\n\"")
  private val defaults = Map("arg" -> "default_for_arg", "def" -> "default_for_def")
  private val globals = Map(
    "arg" -> "global_for_arg", "def" -> "global_for_def",
    "globl" -> "global_for_globl")

  private def invoke(input: String, extra: Map[String, String] = Map.empty): String =
    CfgLexerSubst.invoke(input, args ++ extra, defaults, globals)

  private def invokeFails(input: String, msg: String,
      extra: Map[String, String] = Map.empty): Unit = {
    val e = intercept[CfgLexerSubst.SubstError] { invoke(input, extra) }
    assert(e.getMessage == msg)
  }

  test("double backtick replaced with a single one") {
    assert(invoke("``") == "`")
  }

  test("single backtick causes an error") {
    invokeFails("foo ` bar", "missing closing backtick (`) character")
  }

  test("backtick after quoted character succeeds") {
    assert(invoke("foo \"string \\n`arg`\" bar") == "foo \"string \\narg_value\" bar")
  }

  test("backtick as a quoted character in a string fails") {
    invokeFails("foo \"string \\`arg`\" bar",
      "cannot subsitute backticked values right after a string quote character")
  }

  test("value in normal text replaced with its literal value") {
    assert(invoke("foo `arg` bar") == "foo arg_value bar")
    assert(invoke("foo `simple_string` bar") == "foo \"simple_string_value\" bar")
    assert(invoke("foo `simple_qstring` bar") == "foo 'simple_qstring_value' bar")
    assert(invoke("foo `escaped_string` bar") == "foo \"escaped_string\\\"\\r\\n\" bar")
  }

  test("resolution order is args > defaults > globals > env, with -/_ normalization") {
    assert(invoke("foo `arg` bar") == "foo arg_value bar")
    assert(invoke("foo `def` bar") == "foo default_for_def bar")
    assert(invoke("foo `globl` bar") == "foo global_for_globl bar")
    assert(CfgLexerSubst.invoke("foo `PATH` bar",
      Map.empty, Map.empty, Map.empty) == s"foo ${sys.env("PATH")} bar")
    // cfg_args_normalize_key: simple-string finds simple_string
    assert(invoke("foo `simple-string` bar") == "foo \"simple_string_value\" bar")
  }

  test("values are inserted within strings without their quotes") {
    assert(invoke("foo \"`arg`\" bar") == "foo \"arg_value\" bar")
    assert(invoke("foo '`arg`' bar") == "foo 'arg_value' bar")
    assert(invoke("foo \"x `simple_string` y\" bar") == "foo \"x simple_string_value y\" bar")
    assert(invoke("foo 'x `simple_string` y' bar") == "foo 'x simple_string_value y' bar")
    assert(invoke("foo \"x `ws` y\" bar",
      Map("ws" -> "  \"string_with_whitespace\"   ")) ==
      "foo \"x string_with_whitespace y\" bar")
  }

  test("incorrect strings and multiple tokens are inserted verbatim") {
    assert(invoke("foo \"x `half_string` y\" bar",
      Map("half_string" -> "\"halfstring")) == "foo \"x \"halfstring y\" bar")
    assert(invoke("foo \"x `t1` y\" bar",
      Map("t1" -> "\"str\", token")) == "foo \"x \"str\", token y\" bar")
    assert(invoke("foo \"x `t2` y\" bar",
      Map("t2" -> "\"str1\", token, \"str2\"")) ==
      "foo \"x \"str1\", token, \"str2\" y\" bar")
  }

  test("strings with special chars re-encode when spliced into strings") {
    assert(invoke("foo \"x `q` y\" bar",
      Map("q" -> "\"quote: \\\", newline: \\r\\n, backslash: \\\\\"")) ==
      "foo \"x quote: \\\", newline: \\r\\n, backslash: \\\\ y\" bar")
  }

  test("embedded apostrophe splices into strings but fails in qstrings") {
    val extra = Map("string_with_apostrophe" -> "\"'foo'\"")
    assert(invoke("foo \"x `string_with_apostrophe` y\" bar", extra) ==
      "foo \"x 'foo' y\" bar")
    invokeFails("foo 'x `string_with_apostrophe` y' bar",
      "cannot represent apostrophes within apostroph-enclosed string", extra)
  }

  test("string state tracking survives escaped sequences before the reference") {
    val extra = Map("quoted_escaped_newline" -> "\"\\n\"")
    assert(invoke("\"hello\\n\" `quoted_escaped_newline`", extra) == "\"hello\\n\" \"\\n\"")
    assert(invoke("\"hello\\n\\n\" `quoted_escaped_newline`", extra) == "\"hello\\n\\n\" \"\\n\"")
    assert(invoke("\"hello\\n\\n \" `quoted_escaped_newline`", extra) == "\"hello\\n\\n \" \"\\n\"")
  }
}

/** e2e: `@define` + backticks through the real config front end. */
class CfgDefineE2eSpec extends GraftSuite {
  import spark.implicits._

  test("@define values substitute at top level and inside block bodies") {
    val logs = Seq(("h1", "sshd", "login failed"), ("h2", "cron", "job ok"))
      .toDF("host", "program", "message")
    val cfg = ConfigParser.parse("""
      @version: 4.2
      @define wanted_program "sshd"
      @define greeting hello

      block rewrite p_tag(tag()) {
        set("`greeting`-`tag`", value("MESSAGE"));
      };

      source s { file("/x"); };
      filter f_prog { program(`wanted_program` type(string)); };
      rewrite r { p_tag(tag("world")); };
      destination d { file("/out"); };
      log { source(s); filter(f_prog); rewrite(r); destination(d); };
    """)
    val out = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    val rows = out.select("program", "message").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("sshd", "hello-world")))
  }
  test("options { frac-digits(3); } renders fractional seconds in set()") {
    val logs = Seq(("h1", "p", "m")).toDF("host", "program", "message")
      .withColumn("ts", to_timestamp(lit("2006-02-11 10:34:56")))
    val cfg = ConfigParser.parse("""
      options { frac-digits(3); keep-hostname(yes); };
      source s { file("/x"); };
      rewrite r { set("$ISODATE", value("MESSAGE")); };
      destination d { file("/out"); };
      log { source(s); rewrite(r); destination(d); };
    """)
    assert(cfg.fracDigits == 3)
    assert(cfg.options("keep-hostname") == "yes")
    val out = ConfigCompiler.compile(cfg, Map("s" -> logs)).head.df
    assert(out.select("message").head.getString(0) ==
      "2006-02-11T10:34:56.000+00:00")
  }

  test("@version validation battery (lib/tests/test_pragma.c)") {
    // process_version_string semantics, incl. the quirks: the 7-char
    // guard rejects every overflow form, leading sign on the whole
    // string is invalid, strtol whitespace/sign INSIDE parts is not
    assert(ConfigParser.versionCode("3.27") == 0x031b)
    assert(ConfigParser.versionCode("42.4294957319") == 0) // len > 7
    assert(ConfigParser.versionCode("4294967299.7") == 0)
    assert(ConfigParser.versionCode("72057594037927939.7") == 0)
    assert(ConfigParser.versionCode("4.x") == 0)
    assert(ConfigParser.versionCode(
      "3.7.6.5.4.3.2.1.ignition.orbital.launch-successful!") == 0)
    assert(ConfigParser.versionCode(".+3.7") == 0)
    assert(ConfigParser.versionCode("-1.1031") == 0)
    assert(ConfigParser.versionCode("42.-9977") == 0)
    assert(ConfigParser.versionCode("4.-9") == 0) // short negative minor
    assert(ConfigParser.versionCode("4.2") == 0x0402)
    // a malformed @version aborts the parse; a valid one is accepted
    intercept[IllegalArgumentException] {
      ConfigParser.parse("@version: 4.x\nsource s { internal(); };")
    }
    val cfg = ConfigParser.parse("@version: 4.2\nsource s { internal(); };")
    assert(cfg.sources.contains("s"))
  }
}
