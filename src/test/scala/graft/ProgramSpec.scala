package graft

import org.apache.spark.sql.functions._

/** program()/pipe()/stdin() sources and the program() destination
  * (`/root/reference/modules/afprog/afprog.c`,
  * `modules/affile/named-pipe.c`, `modules/affile/stdin.c`), driven
  * through config text end-to-end. */
class ProgramSpec extends GraftSuite {
  import spark.implicits._

  private def awaitCount(l: graft.streaming.SocketListener, n: Long): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (l.receivedCount < n && System.nanoTime() < deadline) Thread.sleep(20)
    assert(l.receivedCount >= n, s"got ${l.receivedCount}, want $n")
  }

  test("program() source: child stdout lines parse and route") {
    val dir = java.nio.file.Files.createTempDirectory("prog").toFile
    val cfg = graft.config.ConfigParser.parse(
      """source s_prog { program("printf '<13>Jan 12 03:04:05 h9 cron[7]: job done\n<11>Jan 12 03:04:06 h9 app: oops\n'"); };
        |destination d { file("memory"); };
        |log { source(s_prog); destination(d); };
        |""".stripMargin)
    val (routes, listeners) = graft.config.ConfigCompiler
      .compileStreamingPipeline(cfg, spark, dir.getAbsolutePath + "/spool")
    val l = listeners("s_prog")
    try {
      awaitCount(l, 2)
      val q = routes.head.df.writeStream.format("memory")
        .queryName("prog_e2e").outputMode("append")
        .option("checkpointLocation", dir.getAbsolutePath + "/ckpt").start()
      try {
        val dl = System.nanoTime() + 30L * 1000 * 1000 * 1000
        q.processAllAvailable()
        while (spark.table("prog_e2e").count() < 2 && System.nanoTime() < dl) {
          Thread.sleep(100); q.processAllAvailable()
        }
        val got = spark.table("prog_e2e")
          .select("host", "program", "severity", "message").collect()
          .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3)))
          .toSet
        assert(got == Set(("h9", "cron", 5, "job done"), ("h9", "app", 3, "oops")))
      } finally q.stop()
    } finally l.stop()
  }

  test("pipe() source: FIFO lines survive writer churn") {
    assume(new java.io.File("/usr/bin/mkfifo").exists ||
      new java.io.File("/bin/mkfifo").exists)
    val dir = java.nio.file.Files.createTempDirectory("fifo").toFile
    val fifo = new java.io.File(dir, "in.fifo").getAbsolutePath
    assert(new ProcessBuilder("mkfifo", fifo).start().waitFor() == 0)
    val cfg = graft.config.ConfigParser.parse(
      s"""source s_pipe { pipe("$fifo"); };
         |destination d { file("memory"); };
         |log { source(s_pipe); destination(d); };
         |""".stripMargin)
    val (routes, listeners) = graft.config.ConfigCompiler
      .compileStreamingPipeline(cfg, spark, dir.getAbsolutePath + "/spool")
    val l = listeners("s_pipe")
    try {
      // two separate writers — the O_RDWR open means no EOF in between
      for (msg <- Seq("<13>Jan 12 03:04:05 h1 w1: first",
          "<13>Jan 12 03:04:05 h1 w2: second")) {
        val w = new java.io.FileOutputStream(fifo)
        w.write((msg + "\n").getBytes); w.close()
      }
      awaitCount(l, 2)
      val q = routes.head.df.writeStream.format("memory")
        .queryName("pipe_e2e").outputMode("append")
        .option("checkpointLocation", dir.getAbsolutePath + "/ckpt").start()
      try {
        val dl = System.nanoTime() + 30L * 1000 * 1000 * 1000
        q.processAllAvailable()
        while (spark.table("pipe_e2e").count() < 2 && System.nanoTime() < dl) {
          Thread.sleep(100); q.processAllAvailable()
        }
        val progs = spark.table("pipe_e2e").select("program").collect()
          .map(_.getString(0)).toSet
        assert(progs == Set("w1", "w2"))
      } finally q.stop()
    } finally l.stop()
  }

  test("program() destination: rendered lines reach the child's stdin") {
    val dir = java.nio.file.Files.createTempDirectory("progd").toString
    val outFile = s"$dir/captured.txt"
    val in = java.nio.file.Files.createTempDirectory("progd_in")
    java.nio.file.Files.write(in.resolve("in.log"),
      ("<13>Jan 12 03:04:05 h1 app: alpha\n" +
        "<13>Jan 12 03:04:06 h1 app: beta\n").getBytes)
    val conf = s"""
      source s { file("${in.resolve("*.log")}"); };
      destination d { program("cat >> $outFile" template("$${PROGRAM}: $${MESSAGE}")); };
      log { source(s); destination(d); };
    """
    val (routes, _) = graft.config.ConfigCompiler.compileStreamingPipeline(
      graft.config.ConfigParser.parse(conf), spark, s"$dir/unused")
    val q = graft.config.ConfigCompiler.startRoute(routes.head, s"$dir/out", s"$dir/cp")
    q.awaitTermination(60000)
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outFile)), "UTF-8").split("\n").toSet
    assert(lines == Set("app: alpha", "app: beta"))
  }

  test("program() destination: non-zero exit fails the batch") {
    val df = Seq("x").toDF("m")
    intercept[org.apache.spark.SparkException] {
      graft.streaming.ProgramSink.writeBatch(df, "m", "exit 3")
    }
  }

  test("pipe() destination: lines reach a FIFO reader") {
    assume(new java.io.File("/usr/bin/mkfifo").exists ||
      new java.io.File("/bin/mkfifo").exists)
    val dir = java.nio.file.Files.createTempDirectory("piped").toString
    val fifo = s"$dir/out.fifo"
    assert(new ProcessBuilder("mkfifo", fifo).start().waitFor() == 0)
    val buf = new java.io.ByteArrayOutputStream()
    val reader = new Thread(() => {
      val in = new java.io.FileInputStream(fifo)
      try in.transferTo(buf) finally in.close()
    })
    reader.setDaemon(true); reader.start()

    val src = java.nio.file.Files.createTempDirectory("piped_in")
    java.nio.file.Files.write(src.resolve("in.log"),
      "<13>Jan 12 03:04:05 h1 app: through the fifo\n".getBytes)
    val conf = s"""
      source s { file("${src.resolve("*.log")}"); };
      destination d { pipe("$fifo" template("$$MESSAGE")); };
      log { source(s); destination(d); };
    """
    val (routes, _) = graft.config.ConfigCompiler.compileStreamingPipeline(
      graft.config.ConfigParser.parse(conf), spark, s"$dir/unused")
    val q = graft.config.ConfigCompiler.startRoute(routes.head, s"$dir/out", s"$dir/cp")
    q.awaitTermination(60000)
    reader.join(10000)
    assert(new String(buf.toByteArray, "UTF-8") == "through the fifo\n")
  }
}
