package graft

import graft.config.{ConfigCompiler, ConfigParser}
import graft.operators.Slog
import graft.template.Template
import org.apache.spark.sql.functions._

/** Verbatim port of the reference's template-function python-functional
  * e2e pair (`/root/reference/tests/python_functional/functional_tests/
  * template_functions/`): slog/test_secure_logging.py and
  * graphite-output/test_graphite_output.py — generator source →
  * formatted file-destination template, end-to-end through
  * ConfigParser → ConfigCompiler. As in DbParserBatterySpec, the file
  * sink here writes structured rows, so the destination's template()
  * render is applied explicitly through the same Template.column the
  * formatted destinations use. The slogkey / slogverify tool halves
  * map onto Slog's key-file and chain helpers. */
class TemplateFunctionsE2eSpec extends GraftSuite {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  /** Compile + run a generator config, render `template` over the
    * first route, return the rendered lines in generation order (the
    * python harness's file_destination.read_logs analog). */
  private def runGenerator(cfgText: String, template: String,
      n: Int): Seq[String] = {
    val cfg = ConfigParser.parse(cfgText)
    val (routes, _) = ConfigCompiler.compileStreamingPipeline(cfg, spark,
      tmp("graft-tfe2e-sp"))
    val out = routes.head.df
    val rendered = out.withColumn("__line",
      Template.column(template, out.columns.toSeq))
    val qn = "tfe2e_" + math.abs(cfgText.hashCode).toString
    val q = rendered.writeStream.format("memory").queryName(qn)
      .option("checkpointLocation", tmp("graft-tfe2e-cp")).start()
    try {
      val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
      while (spark.table(qn).count() < n &&
          System.nanoTime < deadline) Thread.sleep(200)
    } finally q.stop()
    spark.table(qn).orderBy("seq").select("__line")
      .collect().map(_.getString(0)).toSeq
  }

  test("test_secure_logging.py verbatim: $(iterate) sequence -> $(slog) " +
      "entries carry no cleartext; slogverify round-trip matches") {
    val dir = tmp("graft-slog-e2e")
    // slogkey -m master.key (a fresh master; fixed bytes for replay)
    val master = Array.tabulate[Byte](32)(i => (i * 7 + 3).toByte)
    Slog.writeKeyFile(s"$dir/master.key", master, 0L)
    // slogkey -d master.key foo bar derived.key (deriveHostKey)
    val (mk, mc) = Slog.readKeyFile(s"$dir/master.key").get
    assert(mc == 0L)
    Slog.writeKeyFile(s"$dir/derived.key", Slog.hostKey(mk, "foo", "bar"), 0L)
    // decryption.key = a copy taken BEFORE the run (the live key file
    // evolves per message — conftest.py create_decryption_key)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/derived.key"),
      java.nio.file.Paths.get(s"$dir/decryption.key"))

    val numMessages = 3
    val cfgText =
      """
      source s_gen { example-msg-generator(num(3) freq(0.01)
        template("example-message: $(iterate $(+ 1 $_) 0)")); };
      destination d_file { file("/out/output.log"); };
      log { source(s_gen); destination(d_file); };
      """
    val slogTpl =
      "$(slog -k " + dir + "/derived.key -m " + dir + "/cmac $MSG)"
    val entries = runGenerator(cfgText, slogTpl, numMessages)
    assert(entries.size == numMessages)

    // no cleartext in the log
    assert(!entries.exists(_.contains("example-message")),
      entries.mkString("\n"))

    // settle the $(slog) file side effects (tf_slog_call writes the
    // evolved key and the aggregated MAC incrementally; batch settles
    // once post-materialization)
    assert(Slog.settleChainFiles(s"$dir/derived.key", s"$dir/cmac", entries))
    val (ek, ec) = Slog.readKeyFile(s"$dir/derived.key").get
    assert(ec == numMessages &&
      !java.util.Arrays.equals(ek, Slog.readKeyFile(s"$dir/decryption.key").get._1),
      "key file must hold the EVOLVED key + counter after the run")

    // slogverify -k decryption.key -m cmac output.log decrypted.txt:
    // decrypt + audit the chain, lines formatted "%016x: %s"
    // (slog.c:1078, CTR_LEN_SIMPLE=16)
    val (k0, c0) = Slog.readKeyFile(s"$dir/decryption.key").get
    assert(c0 == 0L)
    val expectedMac = Slog.readMacFile(s"$dir/cmac")
    assert(expectedMac.nonEmpty, "mac file must verify after settle")
    val (pts, ok) = Slog.verifyChain(entries, k0, expectedMac)
    assert(ok, "chain must authenticate against the aggregated MAC")
    val decrypted = pts.zipWithIndex.map { case (pt, i) =>
      f"$i%016x: ${pt.get}"
    }
    assert(decrypted == (0 until numMessages).map(i =>
      f"$i%016x: example-message: $i"), decrypted.mkString("\n"))
  }

  test("tf_slog_prepare: unreadable key file reverts to clear-text " +
      "passthrough; missing -k/-m or message arg is a compile error") {
    val dir = tmp("graft-slog-bad")
    // invalid key file (wrong CMAC): cleartext passthrough, a warning
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/bad.key"), new Array[Byte](56))
    val c = Template.column(
      "$(slog -k " + dir + "/bad.key -m " + dir + "/cmac $MESSAGE)",
      Seq("message", "seq"))
    import spark.implicits._
    val out = Seq(("hello", 0L)).toDF("message", "seq")
      .select(c.as("l")).head.getString(0)
    assert(out == "hello", out)
    // missing message arg / key option / mac option: compile errors
    // (secure-logging.c:128-160)
    intercept[IllegalArgumentException] {
      Template.column("$(slog -k /x -m /y)", Seq("message", "seq"))
    }
    intercept[IllegalArgumentException] {
      Template.column("$(slog -m /y $MESSAGE)", Seq("message", "seq"))
    }
    intercept[IllegalArgumentException] {
      Template.column("$(slog -k /x $MESSAGE)", Seq("message", "seq"))
    }
  }

  test("test_graphite_output.py verbatim: $(graphite-output --timestamp " +
      "'custom_timestamp' --key test.*) emits one line per metric pair") {
    val cfgText =
      """
      source s_gen { example-msg-generator(num(1) freq(0.01)
        values("test.key1" => "value1" "test.key2" => "value2")); };
      destination d_file { file("/out/output.log"); };
      log { source(s_gen); destination(d_file); };
      """
    val rendered = runGenerator(cfgText,
      "$(graphite-output --timestamp 'custom_timestamp' --key test.*)", 1)
    // the one render carries both metric lines, newline-terminated
    // (tf_graphite_foreach_func appends name SP value SP timestamp NL)
    val logs = rendered.head.split("\n", -1).filter(_.nonEmpty).toSeq
    assert(logs == Seq(
      "test.key1 value1 custom_timestamp",
      "test.key2 value2 custom_timestamp"), rendered.head)
  }
}
