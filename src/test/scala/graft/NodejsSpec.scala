package graft

import org.apache.spark.sql.functions._

/** nodejs() source — the winston wire form (`scl/nodejs/plugin.conf`):
  * TCP no-parse + json-parser(extract-prefix("[1]")
  * prefix(".nodejs.winston.")) + MESSAGE promotion. */
class NodejsSpec extends GraftSuite {
  import spark.implicits._

  private def send(port: Int, payload: String): Unit = {
    val s = new java.net.Socket("127.0.0.1", port)
    try {
      val os = s.getOutputStream
      os.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      os.flush()
    } finally s.close()
  }

  test("top-level array flatten via extract-prefix([1])") {
    // winston sends ["log", {level:..., message:...}]
    val got = Seq("""["log",{"level":"info","message":"hi there","meta":{"a":1}}]""")
      .toDF("value")
      .select(graft.functions.JsonFlatten(col("value"), ".nodejs.winston.", "[1]").as("m"))
      .collect().head.getMap[String, String](0).toMap
    assert(got == Map(
      ".nodejs.winston.level" -> "info",
      ".nodejs.winston.message" -> "hi there",
      ".nodejs.winston.meta.a" -> "1"))
    // without extract-prefix a top-level array is still rejected
    val nil = Seq("""["x"]""").toDF("value")
      .select(graft.functions.JsonFlatten(col("value"), ".p.", "").as("m"))
      .collect().head
    assert(nil.isNullAt(0))
  }

  test("nodejs() source e2e: socket → winston record → MESSAGE") {
    val dir = java.nio.file.Files.createTempDirectory("nodejs").toFile
    val cfg = graft.config.ConfigParser.parse(
      """source s_node { nodejs(port(0)); };
        |destination d { file("memory"); };
        |log { source(s_node); destination(d); };
        |""".stripMargin)
    val (routes, listeners) = graft.config.ConfigCompiler
      .compileStreamingPipeline(cfg, spark, dir.getAbsolutePath + "/spool")
    val l = listeners("s_node")
    try {
      send(l.boundPort,
        """["log",{"level":"warn","message":"disk low","service":"api"}]""" + "\n")
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (l.receivedCount < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(l.receivedCount == 1)

      val q = routes.head.df.writeStream.format("memory")
        .queryName("nodejs_e2e").outputMode("append")
        .option("checkpointLocation", dir.getAbsolutePath + "/ckpt").start()
      try {
        // the spool flusher (200 ms cadence) races a one-shot
        // processAllAvailable: poll until the row lands
        val dl = System.nanoTime() + 30L * 1000 * 1000 * 1000
        q.processAllAvailable()
        while (spark.table("nodejs_e2e").isEmpty && System.nanoTime() < dl) {
          Thread.sleep(100)
          q.processAllAvailable()
        }
        val r = spark.table("nodejs_e2e")
          .select(col("message"),
            element_at(col("values"), ".nodejs.winston.level"),
            element_at(col("values"), ".nodejs.winston.service"),
            element_at(col("values"), ".nodejs.winston.message"))
          .collect().head
        assert(r.getString(0) == "disk low")
        assert(r.getString(1) == "warn")
        assert(r.getString(2) == "api")
        // set("" value(".nodejs.winston.message")): cleared, not unset
        assert(r.getString(3) == "")
      } finally q.stop()
    } finally l.stop()
  }
}
