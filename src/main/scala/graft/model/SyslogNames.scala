package graft.model

/** Syslog facility / severity name tables.
  *
  * Semantics follow the reference's name tables
  * (`/root/reference/lib/syslog-names.c:46-111`): 24 facilities, 8
  * severities, `pri = facility * 8 + severity`. Values are standard RFC3164
  * codes (public knowledge); the reference adds a few aliases which we keep.
  */
object SyslogNames {
  val facilities: IndexedSeq[String] = IndexedSeq(
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7")

  val severities: IndexedSeq[String] = IndexedSeq(
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug")

  private val facilityAliases = Map("auth" -> 4, "authpriv" -> 10,
    "security" -> 13, "mark" -> 1023)
  private val severityAliases = Map(
    "panic" -> 0, "emergency" -> 0, "critical" -> 2, "error" -> 3,
    "err" -> 3, "warn" -> 4, "warning" -> 4, "notice" -> 5, "info" -> 6,
    "informational" -> 6, "debug" -> 7)

  val facilityToCode: Map[String, Int] =
    facilities.zipWithIndex.toMap ++ facilityAliases
  val severityToCode: Map[String, Int] =
    severities.zipWithIndex.toMap ++ severityAliases

  def facilityName(code: Int): String =
    if (code >= 0 && code < facilities.length) facilities(code) else code.toString
  def severityName(code: Int): String =
    if (code >= 0 && code < severities.length) severities(code) else code.toString
}
