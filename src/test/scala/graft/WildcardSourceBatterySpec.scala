package graft

import graft.config.ConfigParser.{KV, Lit}
import graft.config.ConfigCompiler
import org.apache.spark.sql.functions._

/** Verbatim port of the reference's wildcard-source battery
  * (`/root/reference/modules/affile/tests/test_wildcard_source.c`):
  * option resolution + validation (wildcard-source.c:39-56, 372-456),
  * last-occurrence-wins duplication, the legacy wildcard file()
  * dirname/basename split (all nine parameterized cases), and the
  * option-inheritance cases driven end-to-end through the config front
  * end onto real files.
  *
  * Engine deviations (documented, not silent): the two window-size
  * cases (log_iw_size → init_window_size clamping) have no engine
  * surface — reader flow-control windows are the engine's backpressure
  * (declared, §2.6 flags(flow-control)); and the padded-inheritance
  * case drops the reference's `max-files(100)` because the engine's
  * pad-size() path is a batch read where a per-trigger file budget is
  * meaningless and explicitly REJECTED rather than silently ignored. */
class WildcardSourceBatterySpec extends GraftSuite {

  private def args(kvs: (String, String)*) =
    kvs.map { case (k, v) => KV(k, Seq(Lit(v))) }

  /** Drain a compiled route's messages (streaming routes via a
    * memory-sink AvailableNow run, batch routes directly). */
  private def drain(df: org.apache.spark.sql.DataFrame,
      qname: String): Seq[String] = {
    if (!df.isStreaming)
      return df.select("message").collect().map(_.getString(0)).toSeq
    val cp = java.nio.file.Files.createTempDirectory("graft-wc-cp").toString
    val q = df.writeStream.format("memory").queryName(qname)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    spark.table(qname).select("message").collect().map(_.getString(0)).toSeq
  }

  test("initial_test: explicit options land on the driver surface (:71)") {
    val spec = ConfigCompiler.wildcardSourceSpec(args(
      "base-dir" -> "/test_non_existent_dir",
      "filename-pattern" -> "*.log",
      "recursive" -> "yes",
      "max-files" -> "100",
      "monitor-method" -> "poll"), "s_test")
    assert(spec.baseDir == "/test_non_existent_dir")
    assert(spec.filenamePattern == "*.log")
    assert(spec.maxFiles == 100)
    assert(spec.recursive)
    assert(spec.monitorMethod == "poll")
  }

  test("defaults: max-files 100 (DEFAULT_MAX_FILES), monitor-method auto, recursive off (:439-456)") {
    val spec = ConfigCompiler.wildcardSourceSpec(args(
      "base-dir" -> "/tmp", "filename-pattern" -> "*.log"), "s_test")
    assert(spec.maxFiles == 100)
    assert(spec.monitorMethod == "auto")
    assert(!spec.recursive)
  }

  test("test_option_duplication: the LAST occurrence of a repeated option wins (:112)") {
    val spec = ConfigCompiler.wildcardSourceSpec(args(
      "base-dir" -> "/tmp",
      "filename-pattern" -> "*.txt",
      "base-dir" -> "/test_non_existent_dir",
      "filename-pattern" -> "*.log"), "s_test")
    assert(spec.baseDir == "/test_non_existent_dir")
    assert(spec.filenamePattern == "*.log")
  }

  test("test_base_dir_required_options (:132) — checked FIRST (:39-56)") {
    val e = intercept[IllegalArgumentException] {
      ConfigCompiler.wildcardSourceSpec(args("filename-pattern" -> "/tmp"), "s_test")
    }
    assert(e.getMessage.contains("base-dir option is required"), e.getMessage)
    // both missing: base-dir reports first, like _check_required_options
    val e2 = intercept[IllegalArgumentException] {
      ConfigCompiler.wildcardSourceSpec(Nil, "s_test")
    }
    assert(e2.getMessage.contains("base-dir option is required"), e2.getMessage)
  }

  test("test_filename_pattern_required_options (:122)") {
    val e = intercept[IllegalArgumentException] {
      ConfigCompiler.wildcardSourceSpec(args("base-dir" -> "/tmp"), "s_test")
    }
    assert(e.getMessage.contains("filename-pattern option is required"), e.getMessage)
  }

  test("test_invalid_monitor_method (:142)") {
    val e = intercept[IllegalArgumentException] {
      ConfigCompiler.wildcardSourceSpec(args(
        "base-dir" -> "/tmp", "filename-pattern" -> "*.log",
        "monitor-method" -> "something else"), "s_test")
    }
    assert(e.getMessage.contains("Invalid monitor-method"), e.getMessage)
  }

  test("test_legacy_wildcard: the nine dirname/basename splits (:179-199)") {
    val cases = Seq(
      ("/a/b/c/d*", "/a/b/c", "d*"),
      ("/a/b/c/d?", "/a/b/c", "d?"),
      ("/*", "/", "*"),
      ("*", ".", "*"),
      ("/tmp/*", "/tmp", "*"),
      ("tmp/?", "tmp", "?"),
      ("tmp*", ".", "tmp*"),
      ("/tmp*", "/", "tmp*"),
      ("tmp/a*", "tmp", "a*"))
    cases.foreach { case (path, dir, base) =>
      assert(ConfigCompiler.legacyWildcardSplit(path) == ((dir, base)),
        s"$path -> ${ConfigCompiler.legacyWildcardSplit(path)}")
    }
  }

  test("test_option_inheritance_multiline: multi-line options reach the wildcard reader, recursion orthogonal (:85, e2e)") {
    // the C config passes recursive(yes) WITH the multi-line options —
    // the directory monitor recursion is orthogonal to the framing
    // proto, so a subdirectory file must frame identically
    val dir = java.nio.file.Files.createTempDirectory("graft-wc").toString
    new java.io.File(s"$dir/sub").mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.log"),
      "1 first\ncont\n2 second\n".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/sub/b.log"),
      "3 third\ndeep\n".getBytes("UTF-8"))
    val cfg = graft.config.ConfigParser.parse(s"""
      source s_test { wildcard-file(base-dir("$dir") filename-pattern("*.log")
        recursive(yes) max-files(100)
        multi-line-mode(regexp) multi-line-prefix('\\d+') flags(no-parse)); };
      destination d { file("/out"); };
      log { source(s_test); destination(d); };
    """)
    val (routes, ls) = ConfigCompiler.compileStreamingPipeline(
      cfg, spark, java.nio.file.Files.createTempDirectory("graft-sp").toString)
    try {
      val rows = drain(routes.head.df, "wc_ml").sorted
      assert(rows == Seq("1 first\ncont", "2 second", "3 third\ndeep"), rows)
    } finally ls.values.foreach(_.stop())
  }

  test("test_option_inheritance_padded: pad-size reaches the wildcard reader (:102, e2e)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wcp").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.log"),
      "ab   cd   ".getBytes("ISO-8859-1"))
    val cfg = graft.config.ConfigParser.parse(s"""
      source s_test { wildcard-file(base-dir("$dir") filename-pattern("*.log")
        pad-size(5) flags(no-parse)); };
      destination d { file("/out"); };
      log { source(s_test); destination(d); };
    """)
    val (routes, ls) = ConfigCompiler.compileStreamingPipeline(
      cfg, spark, java.nio.file.Files.createTempDirectory("graft-sp").toString)
    try {
      val rows = routes.head.df.select("message").collect().map(_.getString(0)).sorted
      assert(rows.toSeq == Seq("ab", "cd"), rows.toSeq)
    } finally ls.values.foreach(_.stop())
  }

  test("recursive(yes): files below base-dir are read, the name pattern filters (engine surface for the recursive flag)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wcr").toString
    new java.io.File(s"$dir/sub/deeper").mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/top.log"),
      "top\n".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/sub/mid.log"),
      "mid\n".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/sub/deeper/deep.log"),
      "deep\n".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/sub/skip.txt"),
      "skip\n".getBytes("UTF-8"))
    val cfg = graft.config.ConfigParser.parse(s"""
      source s_test { wildcard-file(base-dir("$dir") filename-pattern("*.log")
        recursive(yes) flags(no-parse)); };
      destination d { file("/out"); };
      log { source(s_test); destination(d); };
    """)
    val (routes, ls) = ConfigCompiler.compileStreamingPipeline(
      cfg, spark, java.nio.file.Files.createTempDirectory("graft-sp").toString)
    try {
      val rows = drain(routes.head.df, "wc_rec").sorted
      assert(rows == Seq("deep", "mid", "top"), rows)
    } finally ls.values.foreach(_.stop())
  }

  test("legacy wildcard file(): a '*'/'?' path converts to the wildcard source (wildcard_sd_legacy_new, e2e)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wcl").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/x.log"),
      "legacy\n".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/y.txt"),
      "other\n".getBytes("UTF-8"))
    val cfg = graft.config.ConfigParser.parse(s"""
      source s_test { file("$dir/*.log" flags(no-parse)); };
      destination d { file("/out"); };
      log { source(s_test); destination(d); };
    """)
    val (routes, ls) = ConfigCompiler.compileStreamingPipeline(
      cfg, spark, java.nio.file.Files.createTempDirectory("graft-sp").toString)
    try {
      val rows = drain(routes.head.df, "wc_legacy")
      assert(rows == Seq("legacy"), rows)
    } finally ls.values.foreach(_.stop())
  }
}
