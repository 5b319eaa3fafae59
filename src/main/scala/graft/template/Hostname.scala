package graft.template

/** Local-hostname FQDN/short conversions — a clean-room port of
  * `/root/reference/lib/hostname.c` (tests `lib/tests/test_hostname.c`).
  *
  * `localHost` plays gethostname(): its first-dot suffix is the
  * detected local domain. `custom-domain()` (`domainOverride`)
  * REPLACES the domain of any name converted to FQDN form — even an
  * already-qualified one; without an override, qualified names pass
  * through and short names append the local domain. Short conversion
  * always cuts at the first dot.
  *
  * The DNS half of hostname resolution (resolving a short gethostname
  * via the resolver) is the declared env surface; the hostent FQDN
  * extraction helper is here because its selection logic
  * (primary-if-qualified, else first qualified alias) is pure.
  */
final case class Hostname(localHost: String,
    domainOverride: Option[String] = None) {

  val localShort: String = Hostname.short(localHost)

  private val detectedDomain: Option[String] = {
    val i = localHost.indexOf('.')
    if (i >= 0) Some(localHost.substring(i + 1)) else None
  }

  /** The effective domain custom-domain() wins over the detected one. */
  val domain: Option[String] = domainOverride.orElse(detectedDomain)

  /** convert_hostname_to_fqdn. */
  def fqdn(name: String): String =
    domainOverride match {
      case Some(d) => s"${Hostname.short(name)}.$d"
      case None =>
        if (name.contains('.')) name
        else detectedDomain.map(d => s"$name.$d").getOrElse(name)
    }

  /** get_local_hostname_fqdn. */
  def localFqdn: String = fqdn(localShort)
}

object Hostname {

  /** convert_hostname_to_short_hostname: cut at the first dot. */
  def short(name: String): String = {
    val i = name.indexOf('.')
    if (i >= 0) name.substring(0, i) else name
  }

  /** `_extract_fqdn_from_hostent`: the primary name when qualified,
    * else the first qualified alias, else None. */
  def extractFqdnFromHostent(primary: String,
      aliases: Seq[String]): Option[String] =
    if (primary.contains('.')) Some(primary)
    else aliases.find(_.contains('.'))

  /** The engine's gethostname() — used by $LOGHOST. */
  lazy val local: Hostname =
    Hostname(java.net.InetAddress.getLocalHost.getHostName)
}
