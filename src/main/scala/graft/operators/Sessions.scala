package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SortedRunAgg

/** Session-scoped stateful operators, batch form (SURVEY §2.4
  * grouping-by, §2.7 suppress/throttle). The streaming forms share the
  * same semantics via flatMapGroupsWithState (graft.streaming).
  *
  * Scale notes: groupingBy/suppress compile to ONE hash exchange on the
  * key + ONE in-partition (key, ts) sort + a codegen'd Project whose
  * [[graft.functions.SessionOrdinal]] expression assigns session
  * ordinals in a streaming O(1)-state prefix scan + ONE Complete-mode
  * SortAggregate riding the existing (key, ordinal) order via
  * [[org.apache.spark.sql.graftbridge.SortedRunAgg]] — no partial
  * aggregate (it could combine nothing: the ordinal exists only after
  * the exchange), no ObjectHashAggregate fallback sorts, no hash map at
  * all. NOT
  * Spark's builtin `session_window` (useless pre-exchange partial
  * ObjectHashAggregate, 37x/decade at sf100p, r13) and NOT a
  * lag/cumulative-sum Window pass (WindowExec buffers + copies every
  * row per key group across two window operators — 21-33x last decade,
  * scale_matrix_r14.jsonl + jstack attribution). throttle uses a
  * ranking window: one shuffle + in-partition sort, bounded state.
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
    * The session plan is the [[graft.functions.SessionOrdinal]]
    * prefix-scan form (see the body comment for why neither builtin
    * route is used); exposed columns `session_start`/`session_end`
    * keep session_window's [first-event, last-event + gap) frame.
    */
  def groupingBy(df: DataFrame, key: Column, ts: Column, timeoutSeconds: Int,
      aggs: Seq[Column], where: Column = lit(true),
      having: Column = lit(true)): DataFrame = {
    // Gap sessionization is a per-key prefix scan; both builtin routes
    // measured superlinear decades on UNIFORM sf100p data:
    //  - builtin session_window plans a partial ObjectHashAggregate
    //    BEFORE the key exchange where every row is its own
    //    [ts, ts+gap) window — nothing combines, the 128-key sort
    //    fallback hits immediately, struct-window sort keys, and
    //    MergingSessions sorts twice more (37x/decade, r13 matrix);
    //  - the lag/cumulative-sum Window form pays WindowExec's
    //    per-group ExternalAppendOnlyUnsafeRowArray buffering — every
    //    row UnsafeRow.copy()'d into a buffer per window pass, twice
    //    (lag + running sum chain into two Window operators) — 33x
    //    last decade, jstack-attributed (scale_matrix_r14.jsonl).
    // The minimal plan needs NO buffering: ONE exchange on the key,
    // ONE in-partition sort (key, ts), a codegen'd Project whose
    // stateful SessionOrdinal expression assigns ordinals in O(1)
    // state per row, and ONE aggregate over (key, ordinal) whose
    // required clustering the key exchange already satisfies.
    // Session frame matches session_window exactly:
    // [min(ts), max(ts) + gap).
    val sess = df.filter(where).filter(ts.isNotNull)
      .withColumn("__gkey", key).withColumn("__gts", ts)
      .withColumn("__gus", unix_micros(col("__gts").cast("timestamp")))
      .repartition(col("__gkey"))
      .sortWithinPartitions(col("__gkey"), col("__gts"))
      .withColumn("__sess", graft.functions.SessionOrdinal.column(
        col("__gkey"), col("__gus"), timeoutSeconds * 1000000L))
    val agged = sess.withColumn("__gmaxsrc", col("__gts"))
      .groupBy(col("__gkey").as("key"), col("__sess"))
      .agg(aggs.head, (aggs.tail :+
        min(col("__gts")).as("session_start") :+
        max(col("__gmaxsrc")).as("__gmax")): _*)
    // (key, ordinal) groups are CONSECUTIVE under the plan's one
    // existing (key, ts) sort, so the aggregation is a streaming fold:
    // SortedRunAgg claims the order and plans ONE Complete SortAggregate
    // — no partial aggregate, no fallback sorts, one group's buffer in
    // flight. Measured at sf100p cold-JVM vs the default planner routes:
    //  - list aggregates ($(context-values) → collect_list, which forces
    //    ObjectHashAggregate as a partial+final pair, both halves
    //    sort-falling-back at 128 keys over the already-sorted stream):
    //    99.6 s → 24.7 s (grouping_by_session);
    //  - fixed-width aggregates (partial+final codegen HashAggregate
    //    whose partial map fills at ~60M groups and combines ~nothing):
    //    14.4 s → 10.9 s (grouping_by_having), 23.9 → 15.1 (suppress).
    SortedRunAgg.reroute(agged, "__gkey", "__sess")
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
    // collect_list(struct) rides the sorted-run Complete SortAggregate
    // (SortedRunAgg — see groupingBy). The five declarative routes it
    // replaced, A/B'd at sf100p cold-JVM on grouping_by_session: OHA
    // with its default 128-key sort fallback 99.6 s; OHA with the
    // fallback disabled (16M-key map) 319 s GC-bound; planner-chosen
    // SortAggregate (inserts its own re-sort) 180 s; a declarative
    // array-concat aggregate (CollectArrayDecl, deleted with its A/B)
    // 402 s; the interim Window-ordinal plan 416 s. The remaining list
    // cost is the heap materialization of one element per input row --
    // linear in the OUTPUT, which itself is linear in input here.
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
    // Same plan as groupingBy (see its body comment — neither builtin
    // session route survives the sf100p decade): one key exchange, one
    // in-partition (key, ts, order) sort, the SessionOrdinal prefix
    // scan, one codegen'd HashAggregate. A repeat within `seconds` of
    // its predecessor chains the window exactly like session_window's
    // [ts, ts+gap) merge. first(__sord) is the first row of the
    // session under the explicit (key, ts, order) in-partition sort —
    // the sort and the aggregate share one whole-stage pipeline, so
    // the input order is the sorted order (the previous min(struct)
    // form forced a SortAggregate + a second in-task sort).
    df.filter(ts.isNotNull) // session_window drops null-ts rows; keep that
      .withColumn("__skey", key).withColumn("__sts", ts)
      .withColumn("__sord", order)
      .withColumn("__sus", unix_micros(col("__sts").cast("timestamp")))
      .repartition(col("__skey"))
      .sortWithinPartitions(col("__skey"), col("__sts"), col("__sord"))
      .withColumn("__sess", graft.functions.SessionOrdinal.column(
        col("__skey"), col("__sus"), seconds * 1000000L))
      .groupBy(col("__skey").as("suppress_key"), col("__sess"))
      .agg(
        first(col("__sord")).as("first_id"),
        unix_micros(min(col("__sts"))).as("first_ts_us"),
        (count(lit(1)) - 1).as("n_suppressed"))
      // same sorted-run Complete aggregate as groupingBy (see its body
      // comment): 23.9 -> 15.1 s at sf100p cold vs partial+final
      // HashAggregate, 4.0x/decade
      .transform(a => SortedRunAgg.reroute(a, "__skey", "__sess"))
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
