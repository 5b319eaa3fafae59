package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-scoped stateful operators, batch form (SURVEY §2.4
  * grouping-by, §2.7 suppress/throttle). The streaming forms share the
  * same semantics via flatMapGroupsWithState (graft.streaming).
  *
  * Scale notes: groupingBy/suppress compile to ONE hash exchange on the
  * key + ONE (key, ts) sort + a lag/cumulative-sum window assigning
  * session ordinals + one standard aggregate whose required clustering
  * rides the window's partitioning (no second exchange) — NOT Spark's
  * builtin `session_window`, whose partial ObjectHashAggregate combines
  * nothing pre-merge and falls back to per-task sorts (measured
  * 37x/decade at sf100p before the rewrite; see groupingBy body).
  * throttle uses a ranking window: one shuffle + in-partition sort,
  * bounded state.
  */
object Sessions {

  /** grouping-by() (`/root/reference/modules/dbparser/groupingby.c:
    * 35-51,479-487`): sessionize rows per `key` with an inactivity gap
    * of `timeoutSeconds` (`timeout()`), aggregate each session.
    *
    *  - `where` = the reference's where() pre-filter;
    *  - `having` = having() post-filter on the aggregated row;
    *  - `aggs` = aggregate() synthetic-message columns; context
    *    functions map to Spark aggs ($(context-length) → count,
    *    $(context-values $x) → sortedValues below, $(sum $x) → sum).
    *
    * The session plan is the lag/cumulative-sum window-ordinal form
    * (see the body comment for why the builtin `session_window` is NOT
    * used); exposed columns `session_start`/`session_end` keep
    * session_window's [first-event, last-event + gap) frame.
    */
  def groupingBy(df: DataFrame, key: Column, ts: Column, timeoutSeconds: Int,
      aggs: Seq[Column], where: Column = lit(true),
      having: Column = lit(true)): DataFrame = {
    // NOT the builtin `session_window` aggregation: that plans a
    // partial ObjectHashAggregate BEFORE the key exchange, where every
    // row is still its own [ts, ts+gap) window — nothing combines, the
    // hash map blows past the 128-key sort-based fallback immediately
    // (raising the threshold instead OOMs on millions of per-task
    // list buffers), and each task SORTS its whole input on a
    // struct-window key, with MergingSessions sorting again and the
    // final aggregate falling back once more. Measured at sf100p
    // (100M events): ~335 s per task, uniform, zero spill, zero skew —
    // a 37x decade. Gap sessionization is a per-key prefix scan, so
    // the minimal plan is: ONE exchange on the key, ONE sort
    // (key, ts), a window pass assigning session ordinals (a gap
    // opens where ts - lag(ts) >= gap), and ONE standard aggregate
    // over (key, ordinal) — whose required clustering is satisfied by
    // the window's key partitioning (no second exchange) and whose
    // sort-based fallback rides the already-(key, ts)-sorted data.
    // Session frame matches session_window exactly:
    // [min(ts), max(ts) + gap).
    val us = unix_micros(col("__gts").cast("timestamp"))
    val w = Window.partitionBy(col("__gkey")).orderBy(col("__gts"))
    val gapOpen = when(
      us - lag(us, 1).over(w) >= timeoutSeconds * 1000000L, 1L)
      .otherwise(0L)
    val sess = df.filter(where).filter(ts.isNotNull)
      .withColumn("__gkey", key).withColumn("__gts", ts)
      .withColumn("__sess",
        sum(gapOpen).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    sess.withColumn("__gmaxsrc", col("__gts"))
      .groupBy(col("__gkey").as("key"), col("__sess"))
      .agg(aggs.head, (aggs.tail :+
        min(col("__gts")).as("session_start") :+
        max(col("__gmaxsrc")).as("__gmax")): _*)
      .filter(having)
      .withColumn("session_end",
        expr(s"timestampadd(SECOND, $timeoutSeconds, __gmax)"))
      .drop("__sess", "__gmax")
  }

  /** grouping-by's persist name (`groupingby.c:363-369`,
    * test_grouping_by.c:61-111): `grouping-by(<key template text>)` —
    * two parsers share correlation state across a config reload iff
    * their KEY TEMPLATES render the same name. The reference formats
    * into a static 512-byte buffer with g_snprintf, so the name
    * TRUNCATES at 511 bytes — two long templates sharing a 511-byte
    * prefix collide onto one state blob (quirk preserved). IDENTITY is
    * the raw truncated BYTE prefix ([[persistNameBytes]]) exactly like
    * the C buffer; this String form is display-only — a multi-byte char
    * split at byte 511 decodes as U+FFFD here, so two templates
    * differing only inside the split character render the same STRING
    * but remain distinct identities (the C compares bytes). */
  def persistName(keyTemplate: String): String = {
    val b = persistNameBytes(keyTemplate)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The identity form: g_snprintf's 512-byte buffer keeps the first
    * 511 raw bytes of `grouping-by(<template>)` — byte-exact, no
    * charset decode involved. */
  def persistNameBytes(keyTemplate: String): Array[Byte] = {
    val b = s"grouping-by($keyTemplate)"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (b.length <= 511) b else java.util.Arrays.copyOf(b, 511)
  }

  /** The Spark mapping of `cfg_persist_config_fetch` (groupingby.c:
    * 488-506): state identity across config reloads is the CHECKPOINT
    * path, derived from the persist name — a reload keeping the key
    * template resumes its state store; changing it lands on a fresh
    * path (the reference allocates a fresh correlation state when the
    * fetch misses). Sanitized for the filesystem with an md5 suffix so
    * distinct names never collide post-sanitization. */
  def persistCheckpoint(base: String, keyTemplate: String): String = {
    val name = persistName(keyTemplate)
    val safe = name.map(c =>
      if (c.isLetterOrDigit || c == '-' || c == '(' || c == ')') c else '_')
      .take(80)
    // hash the BYTE identity (persistNameBytes), not the decoded string:
    // a U+FFFD-decoded split tail would merge names the C keeps distinct
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(persistNameBytes(keyTemplate))
      .take(8).map(x => f"$x%02x").mkString
    s"$base/$safe-$h"
  }

  /** $(context-values $v) with sort-key() (`groupingby.c:327`): values
    * of a context ordered by `sortKey`, str-repr encoded (the
    * reference's list repr — a value containing a comma renders
    * quoted, test_basicfuncs.c test_context_funcs). Null values (rows
    * a grep condition rejected) drop. Deterministic when sortKey is
    * unique per row. */
  def sortedValues(value: Column, sortKey: Column): Column =
    graft.functions.ListFunctions.list_encode(filter(transform(
      array_sort(collect_list(struct(sortKey.as("k"),
        value.cast("string").as("v")))),
      e => e.getField("v")), _.isNotNull))

  /** Multi-value form: `values` is one array per row (e.g. $(grep cond
    * $PID $PROGRAM) emits every argument per matching row,
    * cond-funcs.c:75-145 interleaved). `limit` caps the number of
    * contributing ROWS ($(grep -m N ...) max-count). `quote` selects
    * the join encoding: $(context-lookup) str-repr-quotes each element
    * (context-funcs.c:78 str_repr_encode_append) while $(grep) appends
    * the RAW rendered values with a bare ',' (cond-funcs.c:133). */
  def sortedValuesMulti(values: Column, sortKey: Column,
      limit: Option[Int] = None, quote: Boolean = true): Column = {
    val sorted = filter(transform(
      array_sort(collect_list(struct(sortKey.as("k"), values.as("v")))),
      e => e.getField("v")), _.isNotNull)
    val limited = limit.map(m => slice(sorted, 1, m)).getOrElse(sorted)
    val flat = flatten(limited)
    if (quote) graft.functions.ListFunctions.list_encode(flat)
    // $(grep): an unset macro renders "" but KEEPS its position and
    // delimiter (cond-funcs.c:133 appends ',' then the rendered value,
    // empty or not) — array_join alone would silently drop nulls and
    // shift every later value left (ADVICE r11)
    else array_join(transform(flat, v => coalesce(v, lit(""))), ",")
  }

  /** suppress(N) (`lib/logwriter.c:565-640`): drop messages identical to
    * the previous one (same `key` — host/program/message in the
    * reference) arriving within `seconds` of it; the suppression window
    * slides with every suppressed repeat, so a run of repeats each
    * within `seconds` of the previous collapses to its first message.
    * That run is exactly a session: emit the first row per session plus
    * the reference's "last message repeated n times" count.
    *
    * `order` breaks arrival-order ties deterministically (§7.4 risk 4:
    * micro-batches reorder; we define order by (ts, order)).
    */
  def suppress(df: DataFrame, key: Column, ts: Column, seconds: Int,
      order: Column): DataFrame = {
    // Same plan as groupingBy (NOT the builtin session_window, whose
    // useless partial ObjectHashAggregate + per-task struct-key sorts
    // measured 12.5x/decade at sf100p — scale_matrix_r13.jsonl): ONE
    // key exchange, ONE (key, ts, order) sort, lag/running-sum session
    // ordinals, one standard aggregate riding the window's
    // partitioning. A repeat within `seconds` of its predecessor chains
    // the window exactly like session_window's [ts, ts+gap) merge.
    val us = unix_micros(col("__sts").cast("timestamp"))
    val w = Window.partitionBy(col("__skey"))
      .orderBy(col("__sts"), col("__sord"))
    val gapOpen = when(
      us - lag(us, 1).over(w) >= seconds * 1000000L, 1L).otherwise(0L)
    df.filter(ts.isNotNull) // session_window drops null-ts rows; keep that
      .withColumn("__skey", key).withColumn("__sts", ts)
      .withColumn("__sord", order)
      .withColumn("__sess",
        sum(gapOpen).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("__skey").as("suppress_key"), col("__sess"))
      .agg(
        min(struct(col("__sts").as("ts"), col("__sord").as("o")))
          .getField("o").as("first_id"),
        unix_micros(min(col("__sts"))).as("first_ts_us"),
        (count(lit(1)) - 1).as("n_suppressed"))
      .drop("__sess")
  }

  /** throttle(N) (`lib/driver.h:169`, token bucket in `lib/logqueue.c`):
    * cap delivery at `n` rows per key per second; rows beyond the cap in
    * any wall-clock second drop. Batch form uses a ranking window —
    * the streaming form holds the token bucket in state. */
  def throttle(df: DataFrame, key: Column, ts: Column, n: Int,
      order: Column): DataFrame = {
    val second = date_trunc("second", ts)
    val w = Window.partitionBy(key, second).orderBy(ts, order)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
