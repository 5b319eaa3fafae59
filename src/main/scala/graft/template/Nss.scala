package graft.template

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** File-backed NSS lookups for the `$(getent)` and `$(dns-resolve-ip)`
  * template functions.
  *
  * The reference resolves these through libc NSS
  * (`modules/getent/tfgetent.c`, getent-passwd.c / getent-group.c /
  * getent-services.c / getent-protocols.c via getpwnam_r & co, and
  * `modules/basicfuncs/ip-funcs.c` + `lib/host-resolve.c` via
  * gethostbyaddr). This implementation is the NSS "files" backend done
  * Spark-first: the flat files (`passwd(5)`, `group(5)`, `services(5)`,
  * `protocols(5)`, `hosts(5)`) are parsed on the driver once per
  * compile, and each lookup becomes a literal-map `element_at` — a
  * foldable Catalyst expression, codegen-friendly, no per-row I/O and
  * no UDF. Live DNS / LDAP / systemd NSS sources stay env surface.
  *
  * The directory is `/etc` unless overridden with the system property
  * `graft.nss.dir` (tests point it at fixture dirs).
  */
object Nss {
  def etcDir: String = sys.props.getOrElse("graft.nss.dir", "/etc")

  private def readLines(name: String): Seq[String] = {
    val f = new java.io.File(etcDir, name)
    if (!f.isFile) Seq.empty
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().toList finally src.close()
    }
  }

  /** Strip trailing comment, trim; None for blank/comment lines. */
  private def data(line: String): Option[String] = {
    val noComment = line.indexOf('#') match {
      case -1 => line
      case i => line.substring(0, i)
    }
    val t = noComment.trim
    if (t.isEmpty) None else Some(t)
  }

  /** passwd(5): name:passwd:uid:gid:gecos:dir:shell */
  private def passwdEntries(): Seq[Map[String, String]] =
    readLines("passwd").flatMap(data).flatMap { l =>
      l.split(":", -1) match {
        case Array(name, _, uid, gid, gecos, dir, shell) =>
          Some(Map("name" -> name, "uid" -> uid, "gid" -> gid,
            "gecos" -> gecos, "dir" -> dir, "shell" -> shell))
        case _ => None
      }
    }

  /** group(5): name:passwd:gid:member,member — members join with ","
    * like the reference's _getent_format_array. */
  private def groupEntries(): Seq[Map[String, String]] =
    readLines("group").flatMap(data).flatMap { l =>
      l.split(":", -1) match {
        case Array(name, _, gid, members) =>
          Some(Map("name" -> name, "gid" -> gid, "members" -> members))
        case _ => None
      }
    }

  /** services(5) / protocols(5): `name number[/proto] alias...` — the
    * reference ignores the protocol qualifier (getservbyname with
    * proto=NULL) and aliases resolve like primary names. */
  private def nameNumberEntries(file: String): Seq[(Seq[String], String)] =
    readLines(file).flatMap(data).flatMap { l =>
      val toks = l.split("\\s+").toSeq
      if (toks.length < 2) None
      else {
        val number = toks(1).takeWhile(_ != '/')
        if (number.isEmpty || !number.forall(_.isDigit)) None
        else Some((toks.head +: toks.drop(2), number))
      }
    }

  /** hosts(5): `ip canonical-name alias...` */
  private def hostsEntries(): Seq[(String, String)] =
    readLines("hosts").flatMap(data).flatMap { l =>
      val toks = l.split("\\s+")
      if (toks.length >= 2) Some(toks(0) -> toks(1)) else None
    }

  private val isNumKey = "^-?[0-9]+$"

  private def firstWins(pairs: Seq[(String, String)]): Map[String, String] =
    pairs.foldLeft(Map.empty[String, String]) { case (m, (k, v)) =>
      if (m.contains(k)) m else m + (k -> v)
    }

  private def mapLit(m: Map[String, String]): Column =
    if (m.isEmpty) map_from_arrays(array(), array())
      .cast("map<string,string>")
    else typedlit(m)

  /** `$(getent service key [member])` — tfgetent.c:160-186. Numeric
    * keys look up by id, others by name; the default member mirrors the
    * reference (passwd/group: id→"name", name→"uid"/"gid";
    * services/protocols: id→name, name→number). Unknown keys expand
    * empty (lookup FALSE in the reference). */
  def getent(service: String, key: Column, member: Option[String]): Column = {
    val k = key.cast("string")
    service match {
      case "passwd" | "group" =>
        val entries = if (service == "passwd") passwdEntries() else groupEntries()
        val idField = if (service == "passwd") "uid" else "gid"
        def byMember(m: String): Map[String, String] = {
          require(entries.isEmpty || entries.head.contains(m),
            s"$$(getent $service): unknown member $m")
          firstWins(entries.map(e => e("name") -> e(m)) ++
            entries.map(e => e(idField) -> e(m)))
        }
        member match {
          case Some(m) => element_at(mapLit(byMember(m)), k)
          case None =>
            val idToName = firstWins(entries.map(e => e(idField) -> e("name")))
            val nameToId = firstWins(entries.map(e => e("name") -> e(idField)))
            when(k.rlike(isNumKey), element_at(mapLit(idToName), k))
              .otherwise(element_at(mapLit(nameToId), k))
        }
      case "services" | "protocols" =>
        val entries = nameNumberEntries(service)
        val numToName = firstWins(entries.map { case (names, num) => num -> names.head })
        val nameToNum = firstWins(entries.flatMap { case (names, num) =>
          names.map(_ -> num)
        })
        when(k.rlike(isNumKey), element_at(mapLit(numToName), k))
          .otherwise(element_at(mapLit(nameToNum), k))
      case other =>
        throw new IllegalArgumentException(
          s"$$(getent): unsupported NSS service $other")
    }
  }

  /** `$(dns-resolve-ip [options] ip)` — ip-funcs.c:125-164 +
    * lib/host-resolve.c. A positive hosts-file hit yields the hostname
    * (shortened at the first dot unless use-fqdn, lowercased when
    * normalize-hostnames); a miss or use-dns(no) yields the IP text
    * itself, never shortened. */
  def dnsResolveIp(ip: Column, useDns: Boolean, useFqdn: Boolean,
      normalize: Boolean): Column = {
    val ipStr = ip.cast("string")
    // an unparseable address expands empty (g_sockaddr_inet_or_inet6_new
    // fails before any resolution; test_basicfuncs.c "!!!invalid...")
    val looksV4 = ipStr.rlike(
      "^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$")
    val looksV6 = ipStr.rlike("^[0-9A-Fa-f:.]*:[0-9A-Fa-f:.]*$")
    val valid = looksV4 || looksV6
    if (!useDns) when(valid, ipStr).otherwise(lit(""))
    else {
      val hosts = firstWins(hostsEntries())
      val hit0 = element_at(mapLit(hosts), ipStr)
      val hit1 = if (useFqdn) hit0 else split(hit0, "\\.").getItem(0)
      val hit = if (normalize) lower(hit1) else hit1
      when(valid, coalesce(hit, ipStr)).otherwise(lit(""))
    }
  }
}
