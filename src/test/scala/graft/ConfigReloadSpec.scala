package graft

import graft.config.{ConfigCompiler, ConfigParser}

/** Port of `/root/reference/tests/python_functional/functional_tests/
  * config_change/test_manipulating_config_between_reload.py` — the
  * reference edits a live config between reload(2)s: update a file
  * source's positional path, add then remove an option
  * (log-iw-size(100)), grow then shrink a destination group, attach
  * then detach a second source group on the logpath — asserting the
  * daemon accepts every intermediate config.
  *
  * The Spark analog of reload is RECOMPILATION: each edited config text
  * compiles from scratch against the same SparkSession, so the spec
  * pins (a) every intermediate text compiles, (b) the route structure
  * tracks the edits (fan-out width, source union), and (c) messages
  * flow end-to-end on the widened stage. State identity across reloads
  * (the persist-name → checkpoint-path contract) is pinned byte-exactly
  * in GroupingByBatterySpec.
  */
class ConfigReloadSpec extends GraftSuite {

  private def dir = java.nio.file.Files.createTempDirectory("graft-reload-")

  test("test_manipulating_config_between_reload.py verbatim: " +
      "source path/option edits, destination-group grow/shrink, " +
      "source-group attach/detach — every stage compiles and routes") {
    val in = dir
    // one subdirectory per logical file so file("<glob>") sources don't
    // cross-match (the reference test uses distinct literal paths)
    def write(name: String, lines: String*): String = {
      val d = in.resolve(name)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve(name + ".log"),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      s"$d/*.log"
    }
    val input = write("input", "<38>Feb  3 12:34:56 host1 app[1]: one")
    val updated = write("updated_input",
      "<38>Feb  3 12:34:56 host2 app[2]: two")
    val input2 = write("input2", "<38>Feb  3 12:34:56 host3 app[3]: three")

    // stage 1: one file source, one single-driver destination group
    val v1 = s"""
      source s1 { file("$input"); };
      destination d1 { file("/out/output.log"); };
      log { source(s1); destination(d1); };
    """
    val (r1, _) = ConfigCompiler.compileStreamingPipeline(
      ConfigParser.parse(v1), spark, dir.toString)
    assert(r1.map(_.destination) == Seq("d1"), r1.map(_.destination))
    assert(r1.head.dest.stmts.size == 1, r1.head.dest.stmts)

    // stage 2 (after the first reload): updated positional path, the
    // added log-iw-size(100) option accepted, a second source group on
    // the same path, a second driver appended to the destination group
    val v2 = s"""
      source s1 { file("$updated" log-iw-size(100)); };
      source s2 { file("$input2"); };
      destination d1 { file("/out/output.log"); file("/out/output2.log"); };
      log { source(s1); source(s2); destination(d1); };
    """
    val (r2, _) = ConfigCompiler.compileStreamingPipeline(
      ConfigParser.parse(v2), spark, dir.toString)
    assert(r2.map(_.destination) == Seq("d1"), r2.map(_.destination))
    assert(r2.head.dest.stmts.size == 2, r2.head.dest.stmts)
    // the widened stage flows end-to-end: both sources' messages reach
    // the route (the union the reference's two source groups produce)
    val qn = "reload_stage2"
    val q = r2.head.df.writeStream.format("memory").queryName(qn)
      .option("checkpointLocation", dir.toString + "/cp2").start()
    try {
      val deadline = System.nanoTime + 60L * 1000 * 1000 * 1000
      while (spark.table(qn).count() < 2 && System.nanoTime < deadline)
        Thread.sleep(200)
    } finally q.stop()
    val hosts = spark.table(qn).select("host").collect()
      .map(_.getString(0)).toSet
    assert(hosts == Set("host2", "host3"), hosts)

    // stage 3 (after the second reload): option removed, group shrunk
    // back to one driver, second source group detached
    val v3 = s"""
      source s1 { file("$updated"); };
      source s2 { file("$input2"); };
      destination d1 { file("/out/output.log"); };
      log { source(s1); destination(d1); };
    """
    val (r3, _) = ConfigCompiler.compileStreamingPipeline(
      ConfigParser.parse(v3), spark, dir.toString)
    assert(r3.map(_.destination) == Seq("d1"), r3.map(_.destination))
    assert(r3.head.dest.stmts.size == 1, r3.head.dest.stmts)
  }
}
