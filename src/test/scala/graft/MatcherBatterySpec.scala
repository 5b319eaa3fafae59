package graft

import graft.operators.{Filters, Rewrites}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's matcher battery, ported case-for-case from
  * `/root/reference/tests/unit/test_matcher.c` — the LogMatcher backends
  * (pcre / string / glob) under match() and subst(), including PCRE's
  * empty-match global-replace iteration that Java's replaceAll gets
  * wrong (`log_matcher_pcre_re_replace`'s NOTEMPTY|ANCHORED retry).
  */
class MatcherBatterySpec extends GraftSuite {
  import spark.implicits._

  private def msgDf(message: String): DataFrame =
    Seq(message).toDF("message")

  /** testcase_replace with the pcre matcher. */
  private def pcreReplace(log: String, re: String, repl: String,
      global: Boolean, store: Boolean = false): String =
    Rewrites.subst(msgDf(log), "message", re, repl, global = global,
      storeMatches = store)
      .select("message").head.getString(0)

  /** testcase_replace with the string matcher. */
  private def stringReplace(log: String, pattern: String, repl: String,
      mode: String, icase: Boolean = false, global: Boolean = false): String =
    Rewrites.substString(msgDf(log), "message", pattern, lit(repl),
      mode = mode, icase = icase, global = global)
      .select("message").head.getString(0)

  /** testcase_match with the string/glob matchers. */
  private def stringMatch(log: String, pattern: String,
      prefix: Boolean = false, substring: Boolean = false,
      icase: Boolean = false): Boolean =
    msgDf(log).filter(Filters.matchesString(pattern, col("message"),
      prefix = prefix, substring = substring, icase = icase)).count() == 1

  private def globMatch(log: String, pattern: String): Boolean =
    msgDf(log).filter(Filters.matchesGlob(pattern, col("message"))).count() == 1

  // ---- Test(matcher, pcre_regexp) ----------------------------------------
  test("pcre replace: first occurrence (test_matcher.c pcre_regexp)") {
    assert(pcreReplace("árvíztűrőtükörfúrógép", "árvíz", "favíz", global = false)
      == "favíztűrőtükörfúrógép")
    assert(pcreReplace("árvíztűrőtükörfúrógép", "^tűrő", "faró", global = false)
      == "árvíztűrőtükörfúrógép")
    assert(pcreReplace("árvíztűrőtükörfúrógép", "tűrő", "", global = false)
      == "árvíztükörfúrógép")
  }

  test("pcre replace: global (test_matcher.c pcre_regexp)") {
    assert(pcreReplace("wikiwiki", "wi", "", global = true) == "kiki")
    assert(pcreReplace("wikiwiki", "wi", "kuku", global = true) == "kukukikukuki")
  }

  // ---- Test(matcher, back_ref) -------------------------------------------
  test("pattern back-reference \\1 (test_matcher.c back_ref)") {
    assert(pcreReplace("wikiwiki", "(wiki)\\1", "", global = false,
      store = true) == "")
  }

  // ---- Test(matcher, empty_global) ---------------------------------------
  test("empty match with global flag (test_matcher.c empty_global)") {
    assert(pcreReplace("aa bb", "c*", "#", global = true) == "#a#a# #b#b#")
    assert(pcreReplace("aa bb", "a*", "#", global = true) == "## #b#b#")
    assert(pcreReplace("aa bb", "a*", "?", global = true) == "?? ?b?b?")
    assert(pcreReplace("aa", "aa|b*", "@", global = true) == "@@")
    assert(pcreReplace("aa", "aa|b*", "@", global = false) == "@")
    // the divergence from Java replaceAll ("@a@a@"): after the empty
    // match at 0, pcre retries the same position NOTEMPTY|ANCHORED and
    // finds "aa"
    assert(pcreReplace("aa", "b*|aa", "@", global = true) == "@@@")
    assert(pcreReplace("aa", "b*|aa", "@", global = false) == "@aa")
  }

  // ---- Test(matcher, string_match) ---------------------------------------
  test("string matcher replace modes (test_matcher.c string_match)") {
    assert(stringReplace("árvíztűrőtükörfúrógép", "árvíz", "favíz",
      mode = "prefix") == "favíztűrőtükörfúrógép")
    assert(stringReplace("árvíztűrőtükörfúrógép", "tűrő", "faró",
      mode = "substring") == "árvízfarótükörfúrógép")
    assert(stringReplace("árvíztűrőtükörfúrógép", "tűrő", "",
      mode = "substring") == "árvíztükörfúrógép")
    assert(stringReplace("árvíztűrőtükörfúrógép", "árvíztűrőtükörfúrógép",
      "almafa", mode = "exact") == "almafa")
    assert(stringReplace("", "valami-amivel-nem-szabadna-matchelni",
      "almafa", mode = "exact") == "")
  }

  test("string matcher match modes (test_matcher.c string_match)") {
    assert(!stringMatch("val", "valami-amivel-nem-szabadna-matchelni"))
    assert(!stringMatch("", "valami-amivel-nem-szabadna-matchelni"))
    assert(!stringMatch("", "valami-amivel-nem-szabadna-matchelni", prefix = true))
    assert(!stringMatch("", "valami-amivel-nem-szabadna-matchelni", substring = true))
    assert(stringMatch("match", "match"))
    assert(stringMatch("match", "ma", prefix = true))
    assert(stringMatch("match", "tch", substring = true))
  }

  test("string matcher ignore-case replace (test_matcher.c string_match)") {
    assert(stringReplace("abcdef", "ABCDEF", "qwerty",
      mode = "prefix", icase = true) == "qwerty")
    assert(stringReplace("abcdef", "BCD", "qwerty",
      mode = "substring", icase = true) == "aqwertyef")
  }

  // ---- Test(matcher, glob_match) -----------------------------------------
  test("glob matcher (test_matcher.c glob_match)") {
    assert(globMatch("árvíztűrőtükörfúrógép", "árvíz*"))
    assert(globMatch("árvíztűrőtükörfúrógép", "*fúrógép"))
    assert(globMatch("árvíztűrőtükörfúrógép", "*fúró*"))
    assert(!globMatch("árvíztűrőtükörfúrógép", "tükör"))
    assert(!globMatch("árvíztűrőtükörfúrógép", "viziló"))
  }

  // ---- Test(matcher, iso88592_never) -------------------------------------
  test("glob never matches invalid UTF-8 (test_matcher.c iso88592_never)") {
    // the iso-8859-2 bytes of "árvíztűrőtükörfúrógép" are not valid
    // UTF-8; GPattern requires UTF-8, so the match is an unconditional
    // FALSE (log_matcher_glob_match)
    val raw = "árvíztűrőtükörfúrógép".getBytes("ISO-8859-2")
    val df = Seq(Tuple1(raw)).toDF("bin")
      .withColumn("message", col("bin").cast("string"))
    // the value survives the binary->string cast byte-for-byte (it is
    // NOT valid utf8) and the glob's utf8 gate rejects it
    assert(df.filter(Filters.matchesGlob("árví*", col("message")))
      .count() == 0)
    assert(df.filter(not(call_function("is_valid_utf8", col("message"))))
      .count() == 1)
  }

  // ---- Test(matcher, replace) --------------------------------------------
  test("replacement $1 register reads the CURRENT match (test_matcher.c replace)") {
    assert(pcreReplace("wikiwiki", "(wiki).+", "#$1#", global = false)
      == "#wiki#")
  }

  // ---- Test(matcher, pcre812_incompatibility) ----------------------------
  test("POSIX classes compile, no digits -> no replace (test_matcher.c pcre812)") {
    assert(pcreReplace("wikiwiki",
      "([[:digit:]]{1,3}\\.){3}[[:digit:]]{1,3}", "foo", global = true)
      == "wikiwiki")
    // and positively: the translated class actually matches digits
    assert(pcreReplace("ip 10.0.0.1 end",
      "([[:digit:]]{1,3}\\.){3}[[:digit:]]{1,3}", "IP", global = true)
      == "ip IP end")
  }

  // ---- config front end: type()/flags() wiring ---------------------------
  test("config: subst type(string) flags(substring ignore-case)") {
    val cfg = graft.config.ConfigParser.parse("""
      source s { file("/x"); };
      destination d { file("/out/x.log"); };
      rewrite r { subst("BCD" "qwerty" value("MESSAGE") type(string) flags(substring ignore-case)); };
      log { source(s); rewrite(r); destination(d); };
    """)
    val out = graft.config.ConfigCompiler.compile(cfg,
      Map("s" -> msgDf("abcdef"))).head.df
    assert(out.select("message").head.getString(0) == "aqwertyef")
  }

  test("config: filter match type(glob) and type(string) flags(prefix)") {
    val cfg = graft.config.ConfigParser.parse("""
      source s { file("/x"); };
      destination d { file("/out/x.log"); };
      filter f { match("árvíz*" value("MESSAGE") type(glob)); };
      log { source(s); filter(f); destination(d); };
    """)
    val out = graft.config.ConfigCompiler.compile(cfg,
      Map("s" -> msgDf("árvíztűrőtükörfúrógép"))).head.df
    assert(out.count() == 1)

    val cfg2 = graft.config.ConfigParser.parse("""
      source s { file("/x"); };
      destination d { file("/out/x.log"); };
      filter f { match("MA" value("MESSAGE") type(string) flags(prefix ignore-case)); };
      log { source(s); filter(f); destination(d); };
    """)
    val out2 = graft.config.ConfigCompiler.compile(cfg2,
      Map("s" -> msgDf("match"))).head.df
    assert(out2.count() == 1)
  }
}
