package graft

import graft.streaming.{Sources, TcpSource}
import org.apache.spark.sql.functions._

/** Dev-mode TCP listener e2e: a real socket pushes syslog lines
  * through framing → spool → Structured Streaming file source →
  * ParseSyslog, the loggen shape of the reference's
  * `tests/functional/test_performance.py`. */
class TcpSourceSpec extends GraftSuite {

  private def send(port: Int, payload: String): Unit = {
    val s = new java.net.Socket("127.0.0.1", port)
    try {
      val os = s.getOutputStream
      os.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      os.flush()
    } finally s.close()
  }

  private def awaitCount(l: TcpSource.Listener, n: Long): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (l.receivedCount < n && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(l.receivedCount == n, s"listener got ${l.receivedCount}, want $n")
  }

  test("socket -> spool -> streaming parse e2e (newline framing)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tcp").toString
    val (listener, lines) = TcpSource.listen(spark, s"$dir/spool")
    try {
      val msgs = (1 to 500).map(i =>
        s"<13>Jan 12 03:04:05 h${i % 7} app$i: payload $i")
      send(listener.boundPort, msgs.mkString("", "\n", "\n"))
      awaitCount(listener, 500)
      listener.stop()
      val q = Sources.parsedSyslog(lines)
        .writeStream.format("memory").queryName("tcp_e2e")
        .option("checkpointLocation", s"$dir/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val out = spark.table("tcp_e2e")
      assert(out.count() == 500)
      val r = out.filter(col("program") === "app42")
        .select("host", "message").head()
      assert(r.getString(0) == "h0" && r.getString(1) == "payload 42")
    } finally listener.stop()
  }

  test("octet-counted framing and proxy-protocol header strip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tcp2").toString
    val (listener, lines) = TcpSource.listen(spark, s"$dir/spool",
      octetCounted = true, proxyProtocol = true)
    try {
      val m1 = "<13>1 2024-01-12T00:00:00Z h1 app - - - first"
      val m2 = "<13>1 2024-01-12T00:00:00Z h2 app - - - second with space"
      val payload = "PROXY TCP4 1.2.3.4 5.6.7.8 1042 514\n" +
        s"${m1.length} $m1" + s"${m2.length} $m2"
      send(listener.boundPort, payload)
      awaitCount(listener, 2)
      listener.stop()
      val q = lines.writeStream.format("memory").queryName("tcp_octet")
        .option("checkpointLocation", s"$dir/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val got = spark.table("tcp_octet").select("value")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(got == Seq(m1, m2).sorted)
    } finally listener.stop()
  }

  test("socket ingest sustains the reference floor (>10k msg/s)") {
    // the reference's only executable perf number: sustained TCP
    // ingest >10k msg/s of ~160 B lines (test_performance.py:41-53).
    // Measured here: first byte -> all frames accepted AND spooled
    // durable (fsync'd rename), the arrival->durability path.
    val dir = java.nio.file.Files.createTempDirectory("graft_tcp3").toString
    val (listener, _) = TcpSource.listen(spark, s"$dir/spool")
    try {
      val n = 50000
      val line = "<13>Jan 12 03:04:05 perfhost app: " + ("x" * 120)
      val payload = Array.fill(n)(line).mkString("", "\n", "\n")
      val t0 = System.nanoTime()
      send(listener.boundPort, payload)
      awaitCount(listener, n.toLong)
      listener.stop() // forces the final spool flush
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = n / secs
      info(f"tcp ingest: $rate%,.0f msg/s over $n msgs ($secs%.2f s)")
      assert(rate > 10000, f"rate $rate%.0f msg/s below the reference floor")
      // everything that was acked reached the spool
      val spooled = spark.read.text(s"$dir/spool/spool-*.log").count()
      assert(spooled == n.toLong)
    } finally listener.stop()
  }
}
