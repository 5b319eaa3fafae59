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
    * anchoring: replace the first occurrence via a capturing wrap. */
  def subst(df: DataFrame, field: String, re: String, replacement: String,
      global: Boolean = false, condition: Column = lit(true)): DataFrame = {
    val replaced =
      if (global) regexp_replace(col(field), re, replacement)
      else regexp_replace(col(field), "^((?s:(?:(?!" + re + ").)*?))(" + re + ")",
        "$1" + replacement)
    guarded(df, field, replaced, condition)
  }

  /** `unset(value(field))` — `rewrite-unset.c`. */
  def unset(df: DataFrame, fields: String*): DataFrame =
    df.drop(fields: _*)

  /** `unset` of a dynamic NV key held in the `values` map column. */
  def unsetValue(df: DataFrame, key: String): DataFrame =
    df.withColumn("values",
      map_filter(col("values"), (k, _) => k =!= lit(key)))

  /** `groupset("v", values("glob*"))` — apply one value to every map key
    * matching a glob (`rewrite-groupset.c:71-136`). */
  def groupSet(df: DataFrame, valueExpr: Column, keyGlob: String,
      mapCol: String = "values"): DataFrame = {
    val re = globToRegex(keyGlob)
    df.withColumn(mapCol,
      map_zip_with(col(mapCol), col(mapCol),
        (k, v, _) => when(k.rlike(re), valueExpr.cast("string")).otherwise(v)))
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

  /** `set-pri()` — `rewrite-set-pri.c`: sets facility*8+severity at once. */
  def setPri(df: DataFrame, value: Column,
      condition: Column = lit(true)): DataFrame = {
    val pri = value.cast("int")
    val df2 = guardedInt(df, "facility", (pri / 8).cast("int"), condition && pri.isNotNull)
    guardedInt(df2, "severity", (pri % 8).cast("int"), condition && pri.isNotNull)
  }

  /** severity name-or-number → code, null if unknown (maps the
    * reference's name table, `lib/syslog-names.c`). */
  def severityCode(value: Column): Column = {
    val s = value.cast("string")
    val byName = SyslogNames.severityToCode.foldLeft(lit(null).cast("int")) {
      case (acc, (name, code)) => when(s === name, lit(code)).otherwise(acc)
    }
    // ANSI-safe: only cast digit strings
    when(s.rlike("^[0-9]+$"), s.cast("int")).otherwise(byName)
  }

  def facilityCode(value: Column): Column = {
    val s = value.cast("string")
    val byName = SyslogNames.facilityToCode.foldLeft(lit(null).cast("int")) {
      case (acc, (name, code)) => when(s === name, lit(code)).otherwise(acc)
    }
    when(s.rlike("^[0-9]+$"), s.cast("int")).otherwise(byName)
  }

  private def guardedInt(df: DataFrame, field: String, value: Column,
      condition: Column): DataFrame = {
    val current = if (df.columns.contains(field)) col(field) else lit(null).cast("int")
    df.withColumn(field, when(condition && value.isNotNull, value).otherwise(current))
  }

  /** `fix-time-zone` / `set-time-zone`: reinterpret the wall-clock of `ts`
    * into another zone (`modules/timestamp/rewrite-fix-timezone.c`). */
  def fixTimeZone(df: DataFrame, field: String, tz: String): DataFrame =
    df.withColumn(field, to_utc_timestamp(col(field), tz))

  def toTimeZone(df: DataFrame, field: String, tz: String): DataFrame =
    df.withColumn(field, from_utc_timestamp(col(field), tz))

  private[graft] def globToRegex(glob: String): String =
    "^" + glob.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"
}
