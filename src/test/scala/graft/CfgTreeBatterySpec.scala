package graft

import graft.config.{ConfigCompiler, ConfigParser}
import org.apache.spark.sql.functions._

/** The cfg-tree compile stage, pinned end-to-end
  * (`/root/reference/lib/cfg-tree.c:923-1178` —
  * cfg_tree_compile_sequence / cfg_tree_compile_junction) plus the
  * `lib/tests/test_cfg_tree.c` lifecycle battery's batch-mappable
  * half.
  *
  * Lifecycle mapping: the reference's cfg_tree_start initializes pipes
  * IN ORDER and stops at the first failing init (test_cfg_tree.c
  * test_pipe_init_multi_with_bad_node: pipes after the bad one are
  * never initialized); our compile is the init walk — elements compile
  * sequentially and the FIRST bad element aborts with its error, later
  * bad elements unreported. The deinit half (only successfully-init'd
  * pipes deinitialize) has no batch analog: compile acquires no
  * per-element resources, Spark materialization owns teardown. */
class CfgTreeBatterySpec extends GraftSuite {
  import spark.implicits._

  private def src() = Seq(
    (1L, "error", "one"), (2L, "info", "two"), (3L, "error", "three"))
    .toDF("event_id", "event_type", "message")
    .withColumn("tags", array().cast("array<string>"))

  private def compile(cfgText: String,
      sources: Map[String, org.apache.spark.sql.DataFrame]) =
    ConfigCompiler.compile(ConfigParser.parse(cfgText), sources)

  test("catch-all flag inside an embedded log / channel is a compile " +
      "error (cfg-tree.c:934, 'only top-level')") {
    val e = intercept[IllegalArgumentException] {
      compile("""
        source s { file("/x"); };
        destination d { file("/out"); };
        log { source(s);
          junction {
            channel { filter(message("one")); flags(catchall); };
            channel { };
          };
          destination(d); };
      """, Map("s" -> src()))
    }
    assert(e.getMessage.contains(
      "catch-all flag can only be specified for top-level log statements"),
      e.getMessage)
    // and the top-level form stays legal
    val routes = compile("""
      source s { file("/x"); };
      destination d { file("/out"); };
      log { destination(d); flags(catchall); };
    """, Map("s" -> src()))
    assert(routes.head.df.count() == 3)
  }

  test("a source reference after a non-source element is a compile " +
      "error (cfg-tree.c:1010 'source-pipe follows a non-source one')") {
    val e = intercept[IllegalArgumentException] {
      compile("""
        source s { file("/x"); };
        source s2 { file("/y"); };
        destination d { file("/out"); };
        log { source(s); filter(message("e"));
          source(s2); destination(d); };
      """, Map("s" -> src(), "s2" -> src()))
    }
    assert(e.getMessage.contains("source-pipe follows a non-source one"),
      e.getMessage)
    // multiple LEADING sources stay legal (they union)
    val routes = compile("""
      source s { file("/x"); };
      source s2 { file("/y"); };
      destination d { file("/out"); };
      log { source(s); source(s2); destination(d); };
    """, Map("s" -> src(), "s2" -> src().withColumn("event_id", col("event_id") + 10)))
    assert(routes.head.df.count() == 6)
  }

  test("junction mixing source and non-source branches is a compile " +
      "error (cfg-tree.c:1124/1146)") {
    for (order <- Seq(
      // source branch first, then non-source
      """channel { source(s2); }; channel { filter(message("e")); };""",
      // non-source first, then source
      """channel { filter(message("e")); }; channel { source(s2); };""")) {
      val e = intercept[IllegalArgumentException] {
        compile(s"""
          source s { file("/x"); };
          source s2 { file("/y"); };
          destination d { file("/out"); };
          log { source(s); junction { $order }; destination(d); };
        """, Map("s" -> src(), "s2" -> src()))
      }
      assert(e.getMessage.contains(
        "source and non-source branches are mixed"), e.getMessage)
    }
  }

  test("an ALL-source junction reads its branches' sources and joins " +
      "them into the flow (fork_mpx never created, tail = join pipe)") {
    val s2 = src().withColumn("event_id", col("event_id") + 10)
    val s3 = src().withColumn("event_id", col("event_id") + 20)
    val routes = compile("""
      source s { file("/x"); };
      source s2 { file("/y"); };
      source s3 { file("/z"); };
      destination d { file("/out"); };
      log { source(s);
        junction { channel { source(s2); }; channel { source(s3); }; };
        destination(d); };
    """, Map("s" -> src(), "s2" -> s2, "s3" -> s3))
    val ids = routes.head.df.select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 11L, 12L, 13L, 21L, 22L, 23L), ids.toSeq)
  }

  test("a branch HEADED by a nested all-source junction is itself a " +
      "source branch (ADVICE r13: it used to be misclassified as mixed)") {
    val s2 = src().withColumn("event_id", col("event_id") + 10)
    val s3 = src().withColumn("event_id", col("event_id") + 20)
    val s4 = src().withColumn("event_id", col("event_id") + 30)
    // outer junction: channel 1 = plain source branch, channel 2 HEADS
    // with a nested all-source junction (a source element per
    // cfg-tree.c:1124-1146 — the nested junction compiles headless)
    val routes = compile("""
      source s { file("/x"); };
      source s2 { file("/y"); };
      source s3 { file("/z"); };
      source s4 { file("/w"); };
      destination d { file("/out"); };
      log { source(s);
        junction {
          channel { source(s2); };
          channel { junction { channel { source(s3); };
                               channel { source(s4); }; }; };
        };
        destination(d); };
    """, Map("s" -> src(), "s2" -> s2, "s3" -> s3, "s4" -> s4))
    val ids = routes.head.df.select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 11L, 12L, 13L, 21L, 22L, 23L,
      31L, 32L, 33L), ids.toSeq)
  }

  test("empty sequence compiles to a do-nothing pipe (cfg-tree.c:1025); " +
      "a destination links T-form — the flow continues past it unchanged " +
      "(cfg-tree.c:1095)") {
    // empty channel: everything passes through
    val routes = compile("""
      source s { file("/x"); };
      destination d { file("/out"); };
      log { source(s); junction { channel { }; }; destination(d); };
    """, Map("s" -> src()))
    assert(routes.head.df.count() == 3)
    // T-form: d1 captures the full stream AT ITS POSITION, the filter
    // then narrows what d2 sees — the destination consumed nothing
    val routes2 = compile("""
      source s { file("/x"); };
      destination d1 { file("/out1"); };
      destination d2 { file("/out2"); };
      log { source(s); destination(d1);
        filter(message("e")); destination(d2); };
    """, Map("s" -> src()))
    val byName = routes2.map(r => r.destination -> r.df).toMap
    assert(byName("d1").count() == 3)
    assert(byName("d2").select("event_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L))
  }

  test("compile is the init walk: sequential, first bad element aborts " +
      "with ITS error (test_cfg_tree.c multi_with_bad_node's ordering)") {
    // p_good compiles; p_bad (undefined) aborts; f_worse (also
    // undefined) is never reached — the reported error names p_bad
    val e = intercept[IllegalArgumentException] {
      compile("""
        source s { file("/x"); };
        parser p_good { csv-parser(columns("a") delimiters(" ")); };
        destination d { file("/out"); };
        log { source(s); parser(p_good); parser(p_bad); filter(f_worse);
          destination(d); };
      """, Map("s" -> src()))
    }
    assert(e.getMessage.contains("p_bad") && !e.getMessage.contains("f_worse"),
      e.getMessage)
  }
}
