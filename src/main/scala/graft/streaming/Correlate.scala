package graft.streaming

import graft.streaming.Stateful.Msg
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** patterndb correlation (SURVEY §2.4, §3.3): rules open named contexts
  * — key = the `context-id` template + `context-scope`
  * (`/root/reference/lib/correlation-key.h:29-39`) — extended by each
  * matching message and closed by `context-timeout`; actions fire
  * on-match or on-timeout, guarded by a `condition()` on the context and
  * a token-bucket rate limit (`modules/dbparser/patterndb.c:198-276`),
  * emitting synthetic messages over the context
  * (`synthetic-message.h:45-56`).
  *
  * Upstream, classify with [[graft.functions.RadixMatch]] and build the
  * context key from its captures; `Msg.value` is the payload the
  * synthetic message template reads.
  */
object Correlate {

  /** Build the correlation key from a rule's context-scope + context-id
    * (`lib/correlation-key.h:29-39`): GLOBAL = id only, HOST = host+id,
    * PROGRAM = host+program+id, PROCESS (default) = host+program+pid+id;
    * the id is a template over the classified row (RadixMatch captures
    * land in `values`, so `$capture` names resolve). Feed the result as
    * [[Stateful.Msg]]`.key` — this is the bridge from a loaded
    * [[graft.patterndb.PdbRule]] to [[correlate]]. */
  def contextKey(contextScope: Option[String], contextId: Option[String],
      columns: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val id = contextId.map(t => graft.template.Template.column(t, columns))
      .getOrElse(lit(""))
    val scopeCols = contextScope.getOrElse("process") match {
      case "global" => Seq.empty[org.apache.spark.sql.Column]
      case "host" => Seq(col("host"))
      case "program" => Seq(col("host"), col("program"))
      case _ => Seq(col("host"), col("program"), col("pid"))
    }
    concat_ws("\u001f",
      (scopeCols :+ id).map(c => coalesce(c.cast("string"), lit(""))): _*)
  }

  /** Emitted synthetic message. `kind` = which trigger fired
    * (match/timeout); `n` = context length; `values` = ordered context
    * payloads (the template's view of the whole context). */
  case class CorrOut(key: String, tsUs: Long, kind: String, n: Long,
      values: String)

  case class CorrState(startUs: Long, lastUs: Long, n: Long, buf: List[String],
      bucketSec: Long, tokens: Long)

  /** The reference's token bucket verbatim (`patterndb.c:196-255`
    * `_is_action_within_rate_limit`): state is (lastCheck, buckets);
    * a fresh limiter starts FULL (buckets = rate); refills use the
    * fixed-point credit arithmetic `((now - last) << 8) /
    * ((quantum << 8) / rate)` — credits accrue RELATIVE to the last
    * check, not on epoch-aligned windows (an epoch-window refill lets a
    * burst at 0:59/1:01 double the rate; the credit form does not —
    * the r9 battery port replaced the old window-rollover refill).
    * Returns (newLastCheck, newBuckets, allowed). */
  def rateLimitAdvance(lastCheck: Long, buckets: Long, nowSec: Long,
      rate: Int, quantumSec: Int): (Long, Long, Boolean) = {
    var last = lastCheck
    var b = buckets
    if (last == 0L) { last = nowSec; b = rate.toLong }
    else {
      // (quantum<<8)/rate underflows to 0 when rate > 256·quantum — in
      // the C that is a division by zero (SIGFPE); at such rates any
      // elapsed second deposits more than a full bucket, so refill
      // outright instead of crashing the task (documented divergence)
      val perCredit = (quantumSec.toLong << 8) / rate
      val newCredits =
        if (perCredit == 0) { if (nowSec != last) rate.toLong else 0L }
        else ((nowSec - last) << 8) / perCredit
      if (newCredits != 0) {
        b = math.min(b + newCredits, rate.toLong)
        last = nowSec
      }
    }
    if (b > 0) (last, b - 1, true) else (last, b, false)
  }

  /** @param onMatchAtLength fire the on-match action when the context
    *        reaches this length (condition() of the action); None = no
    *        on-match action.
    * @param rateLimit (tokens, perSeconds): at most `tokens` on-match
    *        emissions per context per `perSeconds` window (`patterndb.c`
    *        token bucket); timeout emissions are not rate-limited,
    *        as in the reference.
    *
    * Context lifetime is EVENT-time driven on both edges (r8, for
    * replay equivalence): a message whose event time is >=
    * `timeoutSeconds` past the context's last message closes the old
    * context inline (same emission as the watermark callback) and opens
    * a fresh one — without the gap check, whether two bursts separated
    * by more than the timeout share a context would depend on how far
    * the watermark lagged when the second burst ARRIVED, and a replay
    * of the same events could produce different synthetic output. The
    * watermark callback remains the flush path for contexts whose key
    * never recurs. Full-µs event time (Timestamp.getTime is
    * ms-truncated — the r7 Stateful defect class).
    */
  def correlate(ds: Dataset[Msg], timeoutSeconds: Int,
      onMatchAtLength: Option[Int] = None,
      rateLimit: Option[(Int, Int)] = None,
      maxBuffered: Int = 10000,
      maxSortBuffer: Int = 10000): Dataset[CorrOut] = {
    implicit val outEnc = Encoders.product[CorrOut]
    implicit val stEnc = Encoders.product[CorrState]
    implicit val kEnc = Encoders.STRING
    val gapUs = timeoutSeconds * 1000000L
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[Msg], state: GroupState[CorrState]) => {
          def closed(s: CorrState): CorrOut =
            CorrOut(key, s.lastUs, "timeout", s.n, s.buf.reverse.mkString(","))
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(closed(s))
          } else {
            val sorted = Stateful.boundedSorted(rows, maxSortBuffer)
            def fresh = CorrState(Long.MaxValue, Long.MinValue, 0L, Nil,
              Long.MinValue, 0L)
            var s = state.getOption.getOrElse(fresh)
            var out = List.empty[CorrOut]
            for (m <- sorted) {
              val us = Stateful.usOf(m.ts)
              // event-time inactivity gap: the reference's
              // context-timeout elapsed between these two messages —
              // close the old context before this one opens a new one
              if (s.n > 0 && us >= s.lastUs + gapUs) {
                out ::= closed(s)
                // the rate limiter SURVIVES the context close: the
                // reference keeps it in a separate hash keyed on
                // (rule:action, correlation key) — patterndb.c:211-224 —
                // so a fresh context does not refill the bucket. (The
                // watermark-timeout path necessarily drops it with the
                // state blob; a key that never recurs has nothing to
                // rate-limit.)
                s = fresh.copy(bucketSec = s.bucketSec, tokens = s.tokens)
              }
              s = s.copy(startUs = math.min(s.startUs, us),
                lastUs = math.max(s.lastUs, us), n = s.n + 1,
                buf = if (s.n < maxBuffered) m.value :: s.buf else s.buf)
              if (onMatchAtLength.exists(s.n >= _)) {
                // the reference's credit-accrual token bucket
                // (bucketSec carries lastCheck, tokens the bucket fill)
                val allowed = rateLimit match {
                  case None => true
                  case Some((tokens, perSec)) =>
                    val (nl, nb, ok) = rateLimitAdvance(
                      math.max(s.bucketSec, 0L), s.tokens, us / 1000000L,
                      tokens, perSec)
                    s = s.copy(bucketSec = nl, tokens = nb)
                    ok
                }
                if (allowed)
                  out ::= CorrOut(key, us, "match", s.n, s.buf.reverse.mkString(","))
              }
            }
            state.update(s)
            // a straggler-only batch can leave lastUs at the watermark's
            // edge — the re-arm must stay strictly ahead of it (Spark
            // rejects a timeout timestamp <= current watermark)
            state.setTimeoutTimestamp(math.max(
              s.lastUs / 1000L + timeoutSeconds * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            out.reverse.iterator
          }
        })
  }
}
