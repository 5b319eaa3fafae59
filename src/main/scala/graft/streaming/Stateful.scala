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

  /** Full-microsecond event time. `Timestamp.getTime` is MILLIS — the
    * sub-ms part lives in `getNanos`; truncating it made the stateful
    * operators' session frames diverge from the µs-precise batch
    * oracles (StreamBatchEquivalenceSpec caught it). */
  private[streaming] def usOf(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

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
    java.util.Arrays.sort(arr, Ordering.by((m: Msg) => (usOf(m.ts), m.value)))
    arr.iterator ++ rows
  }

  /** Closed-session synthetic message (grouping-by aggregate()):
    * reference emits via synthetic-message templates over the context
    * (`synthetic-message.h:45-56`) — `values` carries the ordered
    * context values for them. */
  case class SessionOut(key: String, startUs: Long, lastUs: Long, n: Long,
      values: String, closedBy: String)

  /** One open context: `buf` holds (tsUs, value) so merged sessions
    * stay event-time ordered (capped at maxBuffered entries). */
  case class Sess(startUs: Long, lastUs: Long, n: Long,
      buf: List[(Long, String)])

  /** ALL open contexts for a key, session_window-style: a key can have
    * several in flight because none may close before the watermark
    * passes its `last + timeout` — holding only the newest (the r6
    * shape) silently MERGED an old straggler into the current context
    * on replay/backfill, diverging from the batch session_window
    * oracle. State is bounded: sessions expire with the watermark, so
    * at most (watermark delay / timeout) + 1 can be open per key. */
  case class SessState(sessions: List[Sess])

  /** grouping-by() streaming form: contexts keyed by `key`, closed by
    * `timeoutSeconds` of event-time inactivity (context-timeout) or
    * early by `trigger` messages (trigger()), emitting one synthetic
    * session row. Caller must set a watermark on `ts` upstream.
    * Sessions merge by gap-overlap exactly like Spark's builtin
    * `session_window`, so a batch replay of the same rows produces
    * row-identical output to [[graft.operators.Sessions.groupingBy]]
    * (StreamBatchEquivalenceSpec) for any disorder within the
    * watermark. */
  def groupingBy(ds: Dataset[Msg], timeoutSeconds: Int,
      trigger: Option[Int] = None, maxBuffered: Int = 10000,
      maxSortBuffer: Int = 10000): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessState]
    implicit val kEnc = Encoders.STRING
    val gapUs = timeoutSeconds * 1000000L
    def close(key: String, s: Sess, by: String): SessionOut =
      SessionOut(key, s.startUs, s.lastUs, s.n,
        s.buf.sortBy(e => (e._1, e._2)).map(_._2).mkString(","), by)
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[Msg], state: GroupState[SessState]) => {
          // expire every session the watermark has passed (both on a
          // timeout tick and eagerly when new rows arrive)
          def sweep(sessions: List[Sess], wmUs: Long):
              (List[SessionOut], List[Sess]) = {
            val (dead, live) = sessions.partition(_.lastUs + gapUs <= wmUs)
            (dead.map(close(key, _, "timeout")), live)
          }
          def rearm(live: List[Sess]): Unit =
            if (live.nonEmpty) {
              state.update(SessState(live))
              state.setTimeoutTimestamp(math.max(
                live.map(_.lastUs).min / 1000L + timeoutSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            } else state.remove()
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          if (state.hasTimedOut) {
            val (out, live) = sweep(state.get.sessions, wmUs)
            rearm(live)
            out.iterator
          } else {
            val sorted = boundedSorted(rows, maxSortBuffer)
            var out = List.empty[SessionOut]
            var sessions = state.getOption.map(_.sessions).getOrElse(Nil)
            for (m <- sorted) {
              val us = usOf(m.ts)
              // session_window merge rule: the row's [us, us+gap)
              // window joins every session whose [start, last+gap)
              // overlaps it; a row between two sessions bridges them
              val (touch, rest) = sessions.partition(s =>
                us + gapUs > s.startUs && us < s.lastUs + gapUs)
              val unit = Sess(us, us, 1L, List(us -> m.value))
              val merged = (unit :: touch).reduce { (a, b) =>
                Sess(math.min(a.startUs, b.startUs),
                  math.max(a.lastUs, b.lastUs), a.n + b.n,
                  if (a.n + b.n <= maxBuffered) b.buf ::: a.buf
                  // over-cap: keep first-N-by-event-time, not an
                  // arbitrary merge-order prefix — matches the batch
                  // operator's sorted buffering policy
                  else (b.buf ::: a.buf).sortBy(e => (e._1, e._2))
                    .take(maxBuffered))
              }
              if (trigger.exists(merged.n >= _)) {
                out ::= close(key, merged, "trigger")
                sessions = rest
              } else sessions = merged :: rest
            }
            val (timedOut, live) = sweep(sessions, wmUs)
            out = timedOut reverse_::: out
            rearm(live)
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
              val us = usOf(m.ts)
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
            for (m <- rows) last = math.max(last, usOf(m.ts))
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

  /** Per-second counters still inside the watermark window. Holding a
    * small (second -> count) ledger instead of only the current second
    * makes cross-batch stragglers exact: a row from second t arriving
    * one micro-batch later (but within the watermark) finds t's counter
    * intact rather than resetting the bucket. Entries older than the
    * watermark are pruned each batch, so state is bounded by the
    * allowed lateness, not the stream's lifetime. */
  case class ThrState(secs: List[(Long, Long)])

  /** throttle(N) streaming form: the reference's per-destination token
    * bucket (`lib/logqueue.c`) keyed by `key`, refilled each event-time
    * second; rows beyond `n` in a second drop. Per-(key,second)
    * admitted COUNTS match the batch
    * [[graft.operators.Sessions.throttle]] ranking exactly for any
    * disorder within the watermark; row IDENTITY additionally matches
    * whenever a second's rows arrive event-time-ordered across batches
    * (within a batch boundedSorted orders them) — the residual
    * divergence is the reference's own arrival-order admission
    * (StreamBatchEquivalenceSpec). */
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
            var secs = state.getOption
              .map(_.secs.toMap).getOrElse(Map.empty[Long, Long])
            // materialize BEFORE state.update: Iterator.flatMap is lazy
            // and would otherwise run after the state write below
            val out = sorted.flatMap { m =>
              val sec = usOf(m.ts) / 1000000L
              val c = secs.getOrElse(sec, 0L)
              if (c < n) { secs = secs.updated(sec, c + 1L); Some(m) }
              else None
            }.toList
            val wmSec = state.getCurrentWatermarkMs() / 1000L
            val kept = secs.view.filter(_._1 >= wmSec).toList
            state.update(ThrState(kept))
            val lastSec = if (kept.nonEmpty) kept.map(_._1).max
              else if (secs.nonEmpty) secs.keys.max else wmSec
            state.setTimeoutTimestamp(math.max(
              (lastSec + 60) * 1000L, state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
        })
  }
}
