package graft

import graft.streaming.Sinks
import graft.streaming.Sinks.HttpConfig
import org.apache.spark.sql.functions._

/** http() destination against an in-process HTTP stub — batch
  * assembly and flush boundaries per `/root/reference/modules/http/
  * http-worker.c` (body-prefix + delimiter-joined messages +
  * body-suffix; flush on batch-lines / batch-bytes), bounded retry,
  * and the streaming foreachBatch path. */
class HttpSinkSpec extends GraftSuite {
  import spark.implicits._

  private def withServer(failFirst: Int = 0)(
      f: (String, java.util.List[String]) => Unit): Unit = {
    val bodies = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val failures = new java.util.concurrent.atomic.AtomicInteger(failFirst)
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/ingest", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      if (failures.getAndDecrement() > 0) ex.sendResponseHeaders(500, -1)
      else { bodies.add(body); ex.sendResponseHeaders(200, -1) }
      ex.close()
    })
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}/ingest", bodies)
    finally srv.stop(0)
  }

  test("batch-lines flush boundaries with prefix/suffix/delimiter") {
    withServer() { (url, bodies) =>
      val cfg = HttpConfig(url, batchLines = 3,
        bodyPrefix = "[", bodySuffix = "]", delimiter = ",")
      val n = Sinks.httpSendPartition(cfg, Iterator("m1", "m2", "m3", "m4", "m5", "m6", "m7"))
      assert(n == 3)
      assert(bodies.toArray.toSeq == Seq("[m1,m2,m3]", "[m4,m5,m6]", "[m7]"))
    }
  }

  test("batch-bytes flush: appending past the byte budget flushes") {
    withServer() { (url, bodies) =>
      // suffix len counts toward the budget (http-worker.c:712)
      val cfg = HttpConfig(url, batchLines = 0, batchBytes = 10,
        bodySuffix = "!", delimiter = "\n")
      Sinks.httpSendPartition(cfg, Iterator("aaaa", "bbbb", "cccc"))
      // "aaaa\nbbbb" + "!" = 10 >= 10 -> flush; then "cccc!"
      assert(bodies.toArray.toSeq == Seq("aaaa\nbbbb!", "cccc!"))
    }
  }

  test("transient 5xx retries then delivers; exhausted retries throw") {
    withServer(failFirst = 2) { (url, bodies) =>
      val cfg = HttpConfig(url, retries = 3, retryBackoffMs = 10)
      Sinks.httpSendPartition(cfg, Iterator("hello"))
      assert(bodies.toArray.toSeq == Seq("hello"))
    }
    withServer(failFirst = 5) { (url, _) =>
      val cfg = HttpConfig(url, retries = 1, retryBackoffMs = 10)
      intercept[java.io.IOException] {
        Sinks.httpSendPartition(cfg, Iterator("nope"))
      }
    }
  }

  private def withCodeServer(codes: Int*)(
      f: (String, java.util.List[String]) => Unit): Unit = {
    // replies with the given status codes in order, then 200s
    val bodies = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val left = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/ingest", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val i = left.getAndIncrement()
      if (i < codes.length) ex.sendResponseHeaders(codes(i), -1)
      else { bodies.add(body); ex.sendResponseHeaders(200, -1) }
      ex.close()
    })
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}/ingest", bodies)
    finally srv.stop(0)
  }

  test("permanent 4xx drops without retry; LTR_ERROR codes retry then drop") {
    // http-worker.c default_map_http_status_to_worker_status:
    // 422 is in the LTR_DROP set — one request, no retry, no batch
    // failure (a replayed micro-batch must not re-POST a payload the
    // server says can never succeed)
    withCodeServer(422) { (url, bodies) =>
      val cfg = HttpConfig(url, retries = 3, retryBackoffMs = 10)
      val n = Sinks.httpSendPartition(cfg, Iterator("poison"))
      assert(n == 1 && bodies.isEmpty) // dropped, no exception
    }
    // 428 is in the LTR_ERROR set — retried up to retries, then
    // dropped (not thrown)
    withCodeServer(428, 428, 428, 428, 428) { (url, bodies) =>
      val cfg = HttpConfig(url, retries = 2, retryBackoffMs = 10)
      Sinks.httpSendPartition(cfg, Iterator("spins"))
      assert(bodies.isEmpty)
    }
    // ...but an LTR_ERROR code clears on retry if the server recovers
    withCodeServer(428) { (url, bodies) =>
      val cfg = HttpConfig(url, retries = 2, retryBackoffMs = 10)
      Sinks.httpSendPartition(cfg, Iterator("recovers"))
      assert(bodies.toArray.toSeq == Seq("recovers"))
    }
  }

  test("multi-url: worker-affine spread across targets and failover on error") {
    // http-loadbalancer.c semantics (r10, battery-pinned): each sending
    // WORKER (thread) is a load-balancer client and stays AFFINE to its
    // target while balanced — the spread happens ACROSS workers, not
    // per request; a failing target is taken out of rotation and the
    // worker fails over to an operational one
    val hitsA = new java.util.concurrent.atomic.AtomicInteger(0)
    val hitsB = new java.util.concurrent.atomic.AtomicInteger(0)
    def stub(hits: java.util.concurrent.atomic.AtomicInteger, ok: Boolean) = {
      val srv = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      srv.createContext("/ingest", (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getRequestBody.readAllBytes()
        hits.incrementAndGet()
        ex.sendResponseHeaders(if (ok) 200 else 503, -1)
        ex.close()
      })
      srv.start()
      srv
    }
    val a = stub(hitsA, ok = true)
    val b = stub(hitsB, ok = true)
    try {
      val urls = Seq(a, b).map(s => s"http://127.0.0.1:${s.getAddress.getPort}/ingest")
      val cfg = HttpConfig(urls.head, urls = urls, retryBackoffMs = 10)
      // two workers: the balancer's per-target goals put one on each
      // (and each stays affine across its 5 requests). Both workers
      // park on a latch after posting: a worker thread that EXITS is
      // legitimately deregistered by the dead-thread sweep, and the
      // survivor would rebalance onto the freed target for its last
      // requests (6/4) — the affinity contract under test holds only
      // while both workers live, as in the reference's fixed pool.
      val done = new java.util.concurrent.CountDownLatch(2)
      val threads = (0 until 2).map { _ =>
        new Thread(() => {
          (1 to 5).foreach(i => Sinks.httpPost(cfg,
            s"m$i".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          done.countDown()
          done.await()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(hitsA.get() == 5 && hitsB.get() == 5, s"${hitsA.get()}/${hitsB.get()}")
    } finally { a.stop(0); b.stop(0) }
    // failover: first target always 503s, every request lands on the
    // healthy second target
    hitsA.set(0); hitsB.set(0)
    val bad = stub(hitsA, ok = false)
    val good = stub(hitsB, ok = true)
    try {
      val urls = Seq(bad, good).map(s => s"http://127.0.0.1:${s.getAddress.getPort}/ingest")
      val cfg = HttpConfig(urls.head, urls = urls, retries = 3, retryBackoffMs = 10)
      (1 to 6).foreach(i => assert(Sinks.httpPost(cfg,
        s"m$i".getBytes(java.nio.charset.StandardCharsets.UTF_8)) == 200))
      assert(hitsB.get() == 6)
    } finally { bad.stop(0); good.stop(0) }
  }

  test("empty partition posts nothing") {
    withServer() { (url, bodies) =>
      val n = Sinks.httpSendPartition(HttpConfig(url), Iterator.empty)
      assert(n == 0 && bodies.isEmpty)
    }
  }

  test("streaming foreachBatch http sink delivers every line") {
    withServer() { (url, bodies) =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[String]
      input.addData("a", "b", "c", "d")
      val dir = java.nio.file.Files.createTempDirectory("graft_http").toString
      val rendered = input.toDF()
        .withColumn("line", concat(lit("msg="), col("value")))
      val q = Sinks.httpSink(rendered, "line",
          HttpConfig(url, batchLines = 2), s"$dir/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val got = bodies.toArray.toSeq.asInstanceOf[Seq[String]]
        .flatMap(_.split("\n")).sorted
      assert(got == Seq("msg=a", "msg=b", "msg=c", "msg=d"))
    }
  }

  test("azure-auth-header: SharedKey signature over length and pinned date") {
    // azure-auth-header.c: sign "METHOD\nlen\nCONTENT_TYPE\n
    // x-ms-date:DATE\nPATH" with HMAC-SHA256(base64-decoded secret)
    val secret = java.util.Base64.getEncoder.encodeToString(
      "0123456789abcdef".getBytes("UTF-8"))
    val auth = Sinks.AzureAuth("ws-1", secret,
      clockMs = () => 1705028645000L) // Fri, 12 Jan 2024 03:04:05 GMT
    val body = "{\"x\":1}".getBytes("UTF-8")

    val captured = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, String)]())
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      captured.add((ex.getRequestHeaders.getFirst("Authorization"),
        ex.getRequestHeaders.getFirst("x-ms-date")))
      ex.getRequestBody.readAllBytes()
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    srv.start()
    try {
      val cfg = HttpConfig(s"http://127.0.0.1:${srv.getAddress.getPort}/",
        azureAuth = Some(auth))
      assert(Sinks.httpPost(cfg, body) == 200)
    } finally srv.stop(0)

    val (authHdr, dateHdr) = captured.get(0)
    assert(dateHdr == "Fri, 12 Jan 2024 03:04:05 GMT")
    // independent recomputation
    val toSign = s"POST\n${body.length}\napplication/json\n" +
      s"x-ms-date:Fri, 12 Jan 2024 03:04:05 GMT\n/api/logs"
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      "0123456789abcdef".getBytes("UTF-8"), "HmacSHA256"))
    val want = java.util.Base64.getEncoder.encodeToString(
      mac.doFinal(toSign.getBytes("UTF-8")))
    assert(authHdr == s"SharedKey ws-1:$want")
  }
}
