package graft.config

import scala.collection.mutable

/** Classic `/etc/syslog.conf` → graft config text, a faithful port of
  * the reference's converter
  * (`/root/reference/scl/syslogconf/convert-syslogconf.awk`, invoked by
  * `scl/syslogconf/plugin.conf` as a confgen at the config root):
  *
  *   - emits the fixed `source msgs { system(); network(transport(udp));
  *     internal(); };` front matter,
  *   - each `facility[,fac...].severity[;...]  destination` line becomes
  *     deduped `filter f_N` blocks (`severity..emerg` ranges, `=severity`
  *     exact levels, `.none` negation), a deduped `destination d_N`
  *     (`@host` → network udp 514, `|/path` → pipe, `/path` / `-/path` →
  *     file, otherwise usertty), and a `log` path joining them,
  *   - selector translation rules exactly as the awk: `*` severity maps
  *     to `debug..emerg`, `emerg` has no range suffix, facility list `*`
  *     drops the facility() term.
  */
object SyslogConf {

  def convert(syslogConf: String): String = {
    val out = new StringBuilder
    out.append(
      "source msgs {\n" +
        "\tsystem();\n" +
        "\tnetwork(transport(udp));\n" +
        "\tinternal();\n" +
        "};\n\n")

    val allFilters = mutable.LinkedHashMap.empty[String, Int]
    val destinations = mutable.LinkedHashMap.empty[String, Int]

    def makeFilter(spec: String): Int = {
      val dot = spec.indexOf('.')
      var severity = spec.substring(dot + 1)
      val faclist = spec.substring(0, math.max(dot, 0)).split(",", -1).toSeq
      val negate = severity == "none"
      if (severity == "*") severity = "debug"

      val filterId = (severity +: faclist).mkString(" ")
      allFilters.getOrElseUpdate(filterId, {
        val n = allFilters.size + 1
        out.append(s"filter f_$n {\n\t")
        if (faclist.head != "*") {
          out.append(if (negate) "not facility(" else "facility(")
          out.append(faclist.mkString(","))
          out.append(")")
          if (severity != "none") out.append(" and ")
        }
        if (severity != "none") {
          if (!severity.startsWith("=")) {
            out.append("level(").append(severity)
            out.append(if (severity == "emerg") ")" else "..emerg)")
          } else {
            out.append("level(").append(severity.substring(1)).append(")")
          }
        }
        out.append(";\n };\n\n")
        n
      })
    }

    def makeDestination(d: String): Int =
      destinations.getOrElseUpdate(d, {
        val n = destinations.size + 1
        out.append(s"destination d_$n { \n")
        if (d.startsWith("@"))
          out.append("\tnetwork(\"" + d.substring(1) + "\" transport(udp) port(514));\n")
        else if (d.startsWith("|/"))
          out.append("\tpipe(\"" + d.substring(1) + "\");\n")
        else if (d.startsWith("/"))
          out.append("\tfile(\"" + d + "\");\n")
        else if (d.startsWith("-/"))
          out.append("\tfile(\"" + d.substring(1) + "\");\n")
        else
          out.append("\tusertty(\"" + d + "\");\n")
        out.append("};\n\n")
        n
      })

    for (line <- syslogConf.linesIterator) {
      val fields = line.trim.split("\\s+").filter(_.nonEmpty)
      if (fields.length == 2 && !fields(0).startsWith("#")) {
        out.append("# " + line + "\n\n")
        val filterNos = fields(0).split(";").toSeq.map(makeFilter)
        val destNo = makeDestination(fields(1))
        out.append("log { source(msgs); ")
        filterNos.foreach(n => out.append(s"filter(f_$n); "))
        out.append(s"destination(d_$destNo); };\n\n")
      }
    }
    out.toString
  }
}
