package graft.operators

import graft.model.SyslogNames
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rewrite operators — column mutations mirroring `/root/reference/lib/
  * rewrite/`. Every rewrite honors an optional `condition()` guard
  * (`lib/rewrite/rewrite-expr.h:37,45`): rows failing the condition pass
  * through unchanged.
  */
object Rewrites {
  private def guarded(df: DataFrame, field: String, value: Column,
      condition: Column): DataFrame = {
    val current = if (df.columns.contains(field)) col(field) else lit(null).cast("string")
    df.withColumn(field, when(condition, value).otherwise(current))
  }

  /** `set("template", value(field) [condition()])` — `rewrite-set.c:49`. */
  def set(df: DataFrame, field: String, value: Column,
      condition: Column = lit(true)): DataFrame =
    guarded(df, field, value, condition)

  /** `subst("re", "replacement", value(field), flags(global))` —
    * `rewrite-subst.c:50-96`. Non-global (first-only) is emulated by
    * anchoring: replace the first occurrence via a capturing wrap.
    * `storeMatches` = `flags(store-matches)` (`lib/logmatcher.c`
    * LMF_STORE_MATCHES): the FIRST match's groups land in the `matches`
    * array column — `$0` whole match, `$1..$N` subgroups, a
    * non-participating subpattern reads as "" (the reference stores the
    * unused group as an empty value, `test_rewrite.c:161-173`). */
  def subst(df: DataFrame, field: String, re: String, replacement: String,
      global: Boolean = false, condition: Column = lit(true),
      storeMatches: Boolean = false, icase: Boolean = false): DataFrame = {
    // the faithful PCRE engine (empty-match NOTEMPTY retry, per-match
    // $N registers) handles every register-only replacement; a
    // replacement referencing real message macros falls back to the
    // Column-template overload via the config front end
    val replaced =
      if (graft.functions.PcreSubst.supportsReplacement(re, replacement))
        graft.functions.PcreSubst(col(field), re, replacement, global, icase)
      else if (global)
        regexp_replace(col(field), (if (icase) "(?iu)" else "") + re, replacement)
      else {
        val pre = if (icase) "(?iu)" else ""
        regexp_replace(col(field),
          pre + "^((?s:(?:(?!" + re + ").)*?))(" + re + ")", "$1" + replacement)
      }
    // matches read the PRE-substitution value: stage them first (same
    // matcher flags as the replace — one logmatcher drives both in the
    // reference, so ignore-case applies to the stored registers too)
    val staged = stageMatches(df, field, re, condition, storeMatches, icase)
    guarded(staged, field, replaced, condition)
  }

  /** `subst(... type(string) flags(prefix|substring [ignore-case]
    * [global]))` — the literal string matcher's replace
    * (`lib/logmatcher.c` log_matcher_string_replace): exact mode
    * replaces the whole value on equality, prefix mode replaces the
    * leading `pattern_len` chars, substring mode the first (or, with
    * global, every non-overlapping) occurrence. A `pattern` longer
    * than the value never matches. */
  def substString(df: DataFrame, field: String, pattern: String,
      replacement: Column, mode: String = "exact", icase: Boolean = false,
      global: Boolean = false, condition: Column = lit(true)): DataFrame = {
    require(pattern.nonEmpty, "substString: empty pattern")
    val v = col(field)
    def ci(c: Column): Column = if (icase) lower(c) else c
    val replaced = mode match {
      case "exact" =>
        when(ci(v) === ci(lit(pattern)), replacement).otherwise(v)
      case "prefix" =>
        when(ci(v).startsWith(ci(lit(pattern))),
          concat(replacement, v.substr(lit(pattern.length + 1),
            length(v)))).otherwise(v)
      case "substring" if !global =>
        val pat = if (icase) pattern.toLowerCase else pattern
        val pos = locate(pat, ci(v))
        when(pos > 0, concat(
          v.substr(lit(1), pos - 1), replacement,
          v.substr(pos + pattern.length, length(v)))).otherwise(v)
      case "substring" =>
        // global: fence every occurrence (literal pattern — regex-safe
        // after quoting) and rebuild, so the replacement Column can be
        // a per-row template
        val re = (if (icase) "(?iu)" else "") +
          java.util.regex.Pattern.quote(pattern)
        val marked = regexp_replace(v, re, "\u0000$0\u0000")
        array_join(transform(split(marked, "\u0000"),
          (s, i) => when(i % 2 === 1, replacement).otherwise(s)), "")
      case other =>
        throw new IllegalArgumentException(s"substString mode: $other")
    }
    guarded(df, field, replaced, condition)
  }

  /** subst with a TEMPLATE replacement (`rewrite-subst.c` renders the
    * replacement LogTemplate per message, then inserts it literally —
    * the rendered text is NOT re-scanned for group references, so `$`
    * and `\` in it are escaped before handing to regexp_replace). */
  def subst(df: DataFrame, field: String, re: String, replacement: Column,
      global: Boolean, condition: Column,
      storeMatches: Boolean, icase: Boolean): DataFrame = {
    val literal = regexp_replace(replacement.cast("string"),
      "([\\\\$])", "\\\\$1")
    val pre = if (icase) "(?iu)" else ""
    val replaced =
      if (global) regexp_replace(col(field), lit(pre + re), literal)
      else regexp_replace(col(field),
        lit(pre + "^((?s:(?:(?!" + re + ").)*?))(" + re + ")"),
        concat(lit("$1"), literal))
    val staged = stageMatches(df, field, re, condition, storeMatches, icase)
    guarded(staged, field, replaced, condition)
  }

  private def stageMatches(df: DataFrame, field: String, re: String,
      condition: Column, storeMatches: Boolean,
      icase: Boolean = false): DataFrame =
    if (!storeMatches) df
    else {
      // the shared logmatcher engine: pcre group semantics (trailing
      // non-participating registers unset, earlier ones "")
      val m = graft.functions.RegexMatchStore(col(field), re,
        dupnames = false, icase = icase)
      df.withColumn("__subst_m", m)
        .withColumn("matches",
          when(condition && col("__subst_m.matched"), col("__subst_m.groups"))
            .otherwise(if (df.columns.contains("matches")) col("matches")
            else lit(null).cast("array<string>")))
        .drop("__subst_m")
    }

  /** Global subst with a COMPUTED per-match replacement — the engine
    * under the reference's templated-replacement substs
    * (`rewrite-subst.c` with `flags(store-matches)` + a `$(func $1)`
    * replacement template, e.g. `scl/rewrite/cc-mask.conf`): each
    * matched span is rewritten by `matchFn(match)`, text between
    * matches passes through. Mechanics: matches are fenced with NUL
    * sentinels (`$0` backref), the string splits into an
    * odd-indices-are-matches array, and a codegen'd `transform` +
    * `array_join` rebuilds it — no UDF. Input text containing literal
    * NUL would confuse the fencing; log payloads never carry NUL (the
    * framing layers strip or reject it). */
  def substEach(df: DataFrame, field: String, re: String,
      matchFn: Column => Column, condition: Column = lit(true)): DataFrame = {
    val marked = regexp_replace(col(field), re, "\u0000$0\u0000")
    val rebuilt = array_join(
      transform(split(marked, "\u0000"),
        (s, i) => when(i % 2 === 1, matchFn(s)).otherwise(s)), "")
    guarded(df, field, rebuilt, condition)
  }

  /** The `@define balabit.credit-card-regexp` of
    * `/root/reference/scl/rewrite/cc-mask.conf`, verbatim — including
    * its first alternative's leading-colon quirk (`(:4...`), kept for
    * wire-level parity with the reference blocks. */
  val CreditCardRegex: String =
    "(:4[0-9]{12}(?:[0-9]{3})?|5[1-5][0-9]{14}|6(?:011|5[0-9][0-9])" +
      "[0-9]{12}|3[47][0-9]{13}|3(?:0[0-5]|[68][0-9])[0-9]{11}|" +
      "(?:2131|1800|35\\d{3})\\d{11})"

  /** `credit-card-mask(value(...))` (`scl/rewrite/cc-mask.conf`):
    * every card number keeps its first 6 and last 4 digits with a
    * literal `******` between — `$(substr $1 0 6)******$(substr $1 -4
    * 4)`. */
  def creditCardMask(df: DataFrame, field: String = "message",
      condition: Column = lit(true)): DataFrame =
    substEach(df, field, CreditCardRegex,
      m => concat(substring(m, 1, 6), lit("******"), substring(m, -4, 4)),
      condition)

  /** `credit-card-hash(value(...))` (`scl/rewrite/cc-mask.conf`):
    * every card number becomes `$(sha1 --length 16 $1)` — the first
    * 16 hex chars of its SHA-1. */
  def creditCardHash(df: DataFrame, field: String = "message",
      condition: Column = lit(true)): DataFrame =
    substEach(df, field, CreditCardRegex,
      m => substring(sha1(m), 1, 16), condition)

  /** `unset(value(field))` — `rewrite-unset.c`. */
  def unset(df: DataFrame, fields: String*): DataFrame =
    df.drop(fields: _*)

  /** `unset` of a dynamic NV key held in the `values` map column. */
  def unsetValue(df: DataFrame, key: String): DataFrame =
    df.withColumn("values",
      map_filter(col("values"), (k, _) => k =!= lit(key)))

  /** `groupset("v", values("glob*" ...))` — apply one value to every map
    * key matching any glob (`rewrite-groupset.c:71-136`). The value may
    * be a template over the OLD value — the reference binds `$_` to the
    * entry being rewritten (`rewrite-groupset.c
    * log_rewrite_groupset_process`, `test_rewrite.c:268-275`) — so the
    * new value is a function of the old one. */
  def groupSet(df: DataFrame, valueFn: Column => Column, keyGlobs: Seq[String],
      mapCol: String = "values", condition: Column = lit(true)): DataFrame = {
    val res = keyGlobs.map(globToRegex)
    def keyHit(k: Column): Column =
      res.map(k.rlike).reduce(_ || _)
    df.withColumn(mapCol,
      when(condition, map_zip_with(col(mapCol), col(mapCol),
        (k, v, _) => when(keyHit(k), valueFn(v).cast("string")).otherwise(v)))
        .otherwise(col(mapCol)))
  }

  /** Single-glob constant-value convenience form. */
  def groupSet(df: DataFrame, valueExpr: Column, keyGlob: String): DataFrame =
    groupSet(df, (_: Column) => valueExpr, Seq(keyGlob))

  def groupSet(df: DataFrame, valueExpr: Column, keyGlob: String,
      mapCol: String): DataFrame =
    groupSet(df, (_: Column) => valueExpr, Seq(keyGlob), mapCol)

  /** `groupunset(values("glob*" ...))` — drop every matching map key
    * (`rewrite-groupset.c`, unset variant; an unset NV reads back as ""
    * like the reference's `log_msg_unset_value`). */
  def groupUnset(df: DataFrame, keyGlobs: Seq[String],
      mapCol: String = "values", condition: Column = lit(true)): DataFrame = {
    val res = keyGlobs.map(globToRegex)
    df.withColumn(mapCol,
      when(condition,
        map_filter(col(mapCol), (k, _) => !res.map(k.rlike).reduce(_ || _)))
        .otherwise(col(mapCol)))
  }

  /** `set-tag("t")` / `clear-tag("t")` — `rewrite-set-tag.c`. */
  def setTag(df: DataFrame, tag: String, condition: Column = lit(true)): DataFrame =
    df.withColumn("tags",
      when(condition, array_union(col("tags"), array(lit(tag))))
        .otherwise(col("tags")))

  def clearTag(df: DataFrame, tag: String, condition: Column = lit(true)): DataFrame =
    df.withColumn("tags",
      when(condition, array_remove(col("tags"), tag)).otherwise(col("tags")))

  /** `set-severity()` — value may be a name or number (`rewrite-set-
    * severity.c`). */
  def setSeverity(df: DataFrame, value: Column,
      condition: Column = lit(true)): DataFrame =
    guardedInt(df, "severity", severityCode(value), condition)

  /** `set-facility()` — `rewrite-set-facility.c`. */
  def setFacility(df: DataFrame, value: Column,
      condition: Column = lit(true)): DataFrame =
    guardedInt(df, "facility", facilityCode(value), condition)

  /** `set-pri()` — `rewrite-set-pri.c:38-54`: sets facility*8+severity
    * at once; valid range 0..1023 (127*8+7), strtol-style leading
    * whitespace and sign, full-string match — anything else leaves the
    * original pri untouched (test_set_pri.c invalid battery). */
  def setPri(df: DataFrame, value: Column,
      condition: Column = lit(true)): DataFrame = {
    val pri = numInRange(value, 1023)
    val df2 = guardedInt(df, "facility", (pri / 8).cast("int"), condition && pri.isNotNull)
    guardedInt(df2, "severity", (pri % 8).cast("int"), condition && pri.isNotNull)
  }

  /** strtol-parse `value` (leading whitespace + optional sign, whole
    * string) and range-check 0..`max`; null = invalid (the rewrite
    * keeps the original field — the reference logs and returns). */
  private def numInRange(value: Column, max: Int): Column = {
    val s = value.cast("string")
    // \z, not $: Java's $ matches before a final newline, so "7\n"
    // would pass — the reference's strtol endptr check (rewrite-set-pri.c
    // _convert_pri) rejects any trailing junk including the newline
    val digits = regexp_extract(s, "^\\s*([+-]?[0-9]+)\\z", 1)
    val num = when(length(digits) > 0, digits.cast("long"))
    when(num.between(0, max), num.cast("int"))
  }

  /** severity name-or-number → code, null if unknown/out-of-range
    * (`rewrite-set-severity.c:41-55`: numbers above 7 are INVALID, not
    * clamped — test_set_severity.c; names per `lib/syslog-names.c`). */
  def severityCode(value: Column): Column = {
    val s = value.cast("string")
    val byName = SyslogNames.severityToCode.foldLeft(lit(null).cast("int")) {
      case (acc, (name, code)) => when(s === name, lit(code)).otherwise(acc)
    }
    coalesce(numInRange(value, 7), byName)
  }

  /** facility name-or-number → code; numeric max 127
    * (`rewrite-set-facility.c:43-55`, test_set_facility.c "128"). */
  def facilityCode(value: Column): Column = {
    val s = value.cast("string")
    val byName = SyslogNames.facilityToCode.foldLeft(lit(null).cast("int")) {
      case (acc, (name, code)) => when(s === name, lit(code)).otherwise(acc)
    }
    coalesce(numInRange(value, 127), byName)
  }

  private def guardedInt(df: DataFrame, field: String, value: Column,
      condition: Column): DataFrame = {
    val current = if (df.columns.contains(field)) col(field) else lit(null).cast("int")
    df.withColumn(field, when(condition && value.isNotNull, value).otherwise(current))
  }

  /** `fix-time-zone(zone)` (`modules/timestamp/rewrite-fix-timezone.c`
    * → `lib/timeutils/unixtime.c:204-302`,
    * `unix_time_fix_timezone_with_tzinfo`): the zone the stamp was
    * parsed with was WRONG — keep its wall clock, re-anchor it in
    * `tz`. In this engine stamps are instants whose UTC rendering IS
    * the wall clock, so the implied source offset is 0 (`srcZone`
    * overrides when the wall was anchored elsewhere).
    *
    * The reference resolves DST by ITERATED OFFSET LOOKUPS AT INSTANTS
    * (the 3-step fixup), not by java.time's local-time rules: an
    * ambiguous autumn wall clock lands on the SECOND occurrence
    * (standard time), where `to_utc_timestamp` alone would pick the
    * FIRST — the ported test_unixtime.c battery proves the divergence
    * inside the overlap hour. Offset-at-instant is pure column
    * algebra: `from_utc_timestamp` shifts by exactly that offset. */
  def fixTimeZone(df: DataFrame, field: String, tz: String,
      srcZone: String = "UTC", condition: Column = lit(true)): DataFrame = {
    def off(zone: String, t: Column): Column =
      from_utc_timestamp(t, zone).cast("long") - t.cast("long")
    def addSec(t: Column, s: Column): Column =
      timestamp_add("SECOND", s, t)
    val t0 = col(field)
    val srcOff = off(srcZone, t0)
    val fixed = off(tz, t0) // STEP 1: lookup at the (wrong) instant
    val t1 = addSec(t0, srcOff - fixed)
    val alt = off(tz, t1) // STEP 2: re-check after the adjustment
    val t2 = addSec(t1, fixed - alt)
    // STEP 3: inside the transition hour the walk is non-linear —
    // spring-forward wall clocks skip ahead by the DST delta
    val inTransition = off(tz, t2) === fixed
    val fixedTs = when(alt === fixed, t1)
      .otherwise(when(inTransition && alt > fixed, addSec(t2, alt - fixed))
        .otherwise(t2))
    df.withColumn(field, when(condition, fixedTs).otherwise(t0))
  }

  /** `set-time-zone(zone)` (`rewrite-set-timezone.c` →
    * `unix_time_set_timezone_with_tzinfo`): the stamp was CORRECT,
    * only its rendering zone changes. The reference keeps the instant
    * and flips `ut_gmtoff`; this engine renders stamps in UTC, so the
    * faithful translation shifts the stored wall to the target zone's
    * wall (downstream UTC-rendered output then equals the reference's
    * zone-rendered output; epoch macros taken AFTER a set-time-zone
    * shift accordingly — the documented trade of a zone-less stamp
    * model). */
  def setTimeZone(df: DataFrame, field: String, tz: String,
      condition: Column = lit(true)): DataFrame =
    df.withColumn(field,
      when(condition, from_utc_timestamp(col(field), tz))
        .otherwise(col(field)))

  def toTimeZone(df: DataFrame, field: String, tz: String): DataFrame =
    df.withColumn(field, from_utc_timestamp(col(field), tz))

  /** The real-world gmtoff whitelist of `unixtime.c:60-131`
    * (`_is_gmtoff_valid`): ±12..+14 h bound, whole hours, plus the
    * curated 30/45-minute offsets in today's tzdata. */
  private val validNonEvenHourGmtoffs: Seq[Long] = Seq(
    -34200L, -16200L, -12600L, -9000L, 12600L, 16200L, 19800L, 20700L,
    23400L, 30600L, 31500L, 34200L, 35100L, 37800L, 41400L, 45900L, 49500L)

  /** `guess-time-zone()` (`rewrite-guess-timezone.c` →
    * `unixtime.c:133-161`,
    * `unix_time_fix_timezone_assuming_the_time_matches_real_time`):
    * assume the message is REAL TIME — if the stamp differs from `now`
    * by less than 24 h AND the difference is within 30 s of a
    * quarter-hour multiple AND the implied corrected offset is a real
    * timezone (whitelist above), the difference was a mis-parsed zone:
    * shift the stamp onto real time. `now` is the arrival clock —
    * `recvd_ts` in batch replays (the reference's wall clock ≈ arrival
    * time in its always-live pipeline). `_div_round` rounds half away
    * from zero, ported exactly. */
  def guessTimeZone(df: DataFrame, field: String, now: Column,
      condition: Column = lit(true)): DataFrame = {
    val diff = now.cast("long") - col(field).cast("long")
    // Column./ is double division; the cast back to long truncates
    // toward zero exactly like the C quotient in _div_round
    val rounded = (when(diff >= 0, ((diff + 450L) / 900L).cast("long"))
      .otherwise(((diff - 450L) / 900L).cast("long"))) * 900L
    // implied source offset is 0 in this engine, so the corrected
    // offset the reference validates is -rounded
    val g = -rounded
    val gmtoffValid = g >= -12L * 3600 && g <= 14L * 3600 &&
      (g % 3600 === 0 || g.isInCollection(validNonEvenHourGmtoffs))
    val applies = condition && abs(diff) < 24L * 3600 &&
      abs(diff - rounded) <= 30 && gmtoffValid
    df.withColumn(field,
      when(applies, timestamp_add("SECOND", rounded, col(field)))
        .otherwise(col(field)))
  }

  private[graft] def globToRegex(glob: String): String =
    "^" + glob.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"
}
