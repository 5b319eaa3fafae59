package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators (SURVEY §2.4 grouping-by + patterndb
  * correlation, §2.7 suppress/throttle) on `flatMapGroupsWithState` —
  * the Spark-native replacement for the reference's correlation state
  * table + timer wheel (`modules/dbparser/correlation.c`,
  * `timerwheel.c:33-39`).
  *
  * Divergence (documented, SURVEY §7.4 risk 3): the reference closes
  * contexts on a wall-clock timer clamped to message time
  * (`groupingby.c:200-221`); here event-time timeouts fire when the
  * WATERMARK passes `last event + timeout`, so late data beyond the
  * watermark delay is dropped rather than reopening state.
  *
  * Scale: state lives in the state store (RocksDB on a real cluster),
  * partitioned by key — the shuffle on the grouping key is the same
  * boundary the reference crosses into its correlation hash table, but
  * distributed. Buffers are capped (`maxBuffered`) so a hot key cannot
  * OOM an executor.
  */
object Stateful {

  /** One keyed message: `key` = the compiled context-id/key() template
    * output; `value` = the payload the aggregate template needs. */
  case class Msg(key: String, ts: java.sql.Timestamp, value: String)

  /** Event-time-order a per-key micro-batch with BOUNDED memory: only
    * the first `cap` rows are materialized and sorted; overflow streams
    * through in arrival order (the reference never sorts at all — it
    * processes arrival order — so a hot key degrades to reference
    * behavior instead of buffering the whole batch). */
  private[streaming] def boundedSorted(rows: Iterator[Msg], cap: Int): Iterator[Msg] = {
    // explicit drain: Iterator.take() leaves the source in an undefined
    // state for further iteration, so the overflow tail must come from
    // the SAME iterator advanced by hand
    val head = scala.collection.mutable.ArrayBuffer.empty[Msg]
    while (head.length < cap && rows.hasNext) head += rows.next()
    val arr = head.toArray
    java.util.Arrays.sort(arr, Ordering.by((m: Msg) => (m.ts.getTime, m.value)))
    arr.iterator ++ rows
  }

  /** Closed-session synthetic message (grouping-by aggregate()):
    * reference emits via synthetic-message templates over the context
    * (`synthetic-message.h:45-56`) — `values` carries the ordered
    * context values for them. */
  case class SessionOut(key: String, startUs: Long, lastUs: Long, n: Long,
      values: String, closedBy: String)

  case class SessState(startUs: Long, lastUs: Long, n: Long,
      buf: List[String])

  /** grouping-by() streaming form: contexts keyed by `key`, closed by
    * `timeoutSeconds` of event-time inactivity (context-timeout) or
    * early by `trigger` messages (trigger()), emitting one synthetic
    * session row. Caller must set a watermark on `ts` upstream. */
  def groupingBy(ds: Dataset[Msg], timeoutSeconds: Int,
      trigger: Option[Int] = None, maxBuffered: Int = 10000,
      maxSortBuffer: Int = 10000): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessState]
    implicit val kEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[Msg], state: GroupState[SessState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(key, s.startUs, s.lastUs, s.n,
              s.buf.reverse.mkString(","), "timeout"))
          } else {
            val sorted = boundedSorted(rows, maxSortBuffer)
            var s = state.getOption.getOrElse(SessState(Long.MaxValue, 0L, 0L, Nil))
            var out = List.empty[SessionOut]
            for (m <- sorted) {
              val us = m.ts.getTime * 1000L
              s = SessState(math.min(s.startUs, us), math.max(s.lastUs, us),
                s.n + 1, if (s.n < maxBuffered) m.value :: s.buf else s.buf)
              if (trigger.exists(s.n >= _)) {
                out ::= SessionOut(key, s.startUs, s.lastUs, s.n,
                  s.buf.reverse.mkString(","), "trigger")
                s = SessState(Long.MaxValue, 0L, 0L, Nil)
              }
            }
            if (s.n > 0) {
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + timeoutSeconds * 1000L)
            } else state.remove()
            out.reverse.iterator
          }
        })
  }

  /** Suppressed-run output: the first message passes through
    * (`kind="msg"`), the collapsed repeats surface as the reference's
    * "last message repeated n times" summary (`lib/logwriter.c:565-640`)
    * when the run closes. */
  case class SuppressOut(key: String, tsUs: Long, value: String, kind: String,
      n: Long)

  case class SuppState(lastUs: Long, firstValue: String, n: Long)

  /** Streaming exact dedup: the first row with a given (key, payload
    * fingerprint) passes; identical payloads arriving within the
    * upstream watermark delay are dropped. Built on Spark's
    * dropDuplicatesWithinWatermark keyed state, so entries EXPIRE once
    * the watermark passes them — state is bounded by the dedup window,
    * not the stream's lifetime (the property that lets an exact-dedup
    * gate run on an unbounded 100 TB/day feed; the batch-side
    * [[graft.pipeline.Dedup.exactSurvivors]] is the offline analog).
    * Caller must set a watermark on `ts` upstream; a payload recurring
    * AFTER the delay is admitted again — re-dedup offline if the window
    * must be global. */
  def dedupExact(ds: Dataset[Msg]): Dataset[Msg] = {
    import org.apache.spark.sql.functions.col
    implicit val enc = Encoders.product[Msg]
    ds.withColumn("__fp",
        graft.pipeline.TextAnalysis.fingerprint(col("value")))
      .dropDuplicatesWithinWatermark("key", "__fp")
      .drop("__fp")
      .as[Msg]
  }

  /** suppress(N) streaming form: emits each first-of-run immediately;
    * repeats within `seconds` of the previous (window slides per repeat)
    * are absorbed into state; timeout emits the summary row. */
  def suppress(ds: Dataset[Msg], seconds: Int,
      maxSortBuffer: Int = 10000): Dataset[SuppressOut] = {
    implicit val outEnc = Encoders.product[SuppressOut]
    implicit val stEnc = Encoders.product[SuppState]
    implicit val kEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[Msg], state: GroupState[SuppState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            if (s.n > 0)
              Iterator.single(SuppressOut(key, s.lastUs, s.firstValue, "summary", s.n))
            else Iterator.empty
          } else {
            val sorted = boundedSorted(rows, maxSortBuffer)
            var out = List.empty[SuppressOut]
            var s = state.getOption.orNull
            for (m <- sorted) {
              val us = m.ts.getTime * 1000L
              if (s == null || us - s.lastUs >= seconds * 1000000L) {
                if (s != null && s.n > 0)
                  out ::= SuppressOut(key, s.lastUs, s.firstValue, "summary", s.n)
                out ::= SuppressOut(key, us, m.value, "msg", 0L)
                s = SuppState(us, m.value, 0L)
              } else {
                s = SuppState(us, s.firstValue, s.n + 1)
              }
            }
            state.update(s)
            state.setTimeoutTimestamp(s.lastUs / 1000L + seconds * 1000L)
            out.reverse.iterator
          }
        })
  }

  /** A MARK row: the reference's `log_msg_new_mark()` ("-- MARK --",
    * pri = syslog.info — logmsg.c:1396-1403). */
  case class MarkOut(key: String, tsUs: Long, message: String,
      facility: Int, severity: Int)

  case class MarkState(lastUs: Long)

  /** mark-freq() / mark-mode(dst-idle): emit "-- MARK --" after every
    * `seconds` of inactivity on the key (the writer's mark timer,
    * logwriter.c:779-824 — traffic postpones it, each firing re-arms
    * it). Event-time form: when the watermark passes `last + seconds`
    * the timer fires and catch-up marks are emitted at every elapsed
    * `seconds` boundary up to the watermark (the repeated re-arms,
    * compressed into one batch), capped at `maxMarksPerBatch` so a
    * year-long gap cannot flood the sink. Same watermark-vs-wall-clock
    * divergence as groupingBy: a stream with no traffic anywhere holds
    * the watermark, so marks need SOME upstream liveness — on a real
    * cluster feed the source keeps ticking and this matches the
    * reference's behavior. */
  def markFreq(ds: Dataset[Msg], seconds: Int,
      maxMarksPerBatch: Int = 1000): Dataset[MarkOut] = {
    implicit val outEnc = Encoders.product[MarkOut]
    implicit val stEnc = Encoders.product[MarkState]
    implicit val kEnc = Encoders.STRING
    val freqUs = seconds * 1000000L
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[Msg], state: GroupState[MarkState]) => {
          if (state.hasTimedOut) {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            var last = state.get.lastUs
            var out = List.empty[MarkOut]
            var emitted = 0
            while (last + freqUs <= wmUs && emitted < maxMarksPerBatch) {
              last += freqUs
              out ::= MarkOut(key, last, "-- MARK --", 5, 6)
              emitted += 1
            }
            state.update(MarkState(last))
            // next boundary is beyond the watermark by construction —
            // EXCEPT when the per-batch cap truncated the catch-up run;
            // clamp (Spark rejects timeouts at/under the watermark) and
            // the remaining boundaries emit next batch
            state.setTimeoutTimestamp(
              math.max(last / 1000L + seconds * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            out.reverse.iterator
          } else {
            var last = state.getOption.map(_.lastUs).getOrElse(Long.MinValue)
            for (m <- rows) last = math.max(last, m.ts.getTime * 1000L)
            state.update(MarkState(last))
            // traffic postpones the timer (dst-idle semantics); clamp
            // above the watermark for late stragglers
            val wmMs = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
              math.max(last / 1000L + seconds * 1000L, wmMs + 1L))
            Iterator.empty
          }
        })
  }

  case class ThrState(sec: Long, count: Long)

  /** throttle(N) streaming form: the reference's per-destination token
    * bucket (`lib/logqueue.c`) keyed by `key`, refilled each event-time
    * second; rows beyond `n` in a second drop. */
  def throttle(ds: Dataset[Msg], n: Int,
      maxSortBuffer: Int = 10000): Dataset[Msg] = {
    implicit val msgEnc = Encoders.product[Msg]
    implicit val stEnc = Encoders.product[ThrState]
    implicit val kEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[Msg], state: GroupState[ThrState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = boundedSorted(rows, maxSortBuffer)
            var s = state.getOption.getOrElse(ThrState(-1L, 0L))
            val out = sorted.flatMap { m =>
              val sec = m.ts.getTime / 1000L
              if (sec != s.sec) s = ThrState(sec, 0L)
              if (s.count < n) { s = ThrState(s.sec, s.count + 1); Some(m) }
              else None
            }
            state.update(s)
            state.setTimeoutTimestamp((s.sec + 60) * 1000L)
            out.iterator
          }
        })
  }
}
