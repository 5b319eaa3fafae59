package graft

import graft.template.Template
import org.apache.spark.sql.functions._

/** $(getent) / $(dns-resolve-ip) / $(env) — the NSS files backend
  * (template.Nss) against fixture passwd/group/services/protocols/hosts
  * files, mirroring modules/getent/tfgetent.c and
  * modules/basicfuncs/ip-funcs.c semantics. */
class NssSpec extends GraftSuite {
  import spark.implicits._

  private def withEtc[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("nss").toFile
    def put(name: String, text: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
      try w.write(text) finally w.close()
    }
    put("passwd",
      """root:x:0:0:root:/root:/bin/bash
        |# comment line
        |daemon:x:1:1:daemon:/usr/sbin:/usr/sbin/nologin
        |alice:x:1000:1000:Alice A.:/home/alice:/bin/zsh
        |""".stripMargin)
    put("group",
      """root:x:0:
        |wheel:x:10:alice,bob
        |""".stripMargin)
    put("services",
      """syslog 514/udp
        |http 80/tcp www www-http # alias resolution
        |https 443/tcp
        |""".stripMargin)
    put("protocols",
      """icmp 1 ICMP
        |tcp 6 TCP
        |""".stripMargin)
    put("hosts",
      """127.0.0.1 localhost
        |10.0.0.7 Web01.Example.Com web01
        |# trailing comment
        |""".stripMargin)
    val prev = sys.props.get("graft.nss.dir")
    sys.props("graft.nss.dir") = dir.getAbsolutePath
    try body finally {
      prev match {
        case Some(p) => sys.props("graft.nss.dir") = p
        case None => sys.props -= "graft.nss.dir"
      }
      dir.listFiles.foreach(_.delete()); dir.delete()
    }
  }

  private def render(t: String, cols: (String, String)*): String = {
    val df0 = Seq(1).toDF("one")
    val df = cols.foldLeft(df0) { case (d, (n, v)) => d.withColumn(n, lit(v)) }
    df.select(Template.column(t, df.columns).cast("string").as("out"))
      .collect().head.getString(0)
  }

  test("getent passwd: name and uid keys, default and explicit members") {
    withEtc {
      assert(render("$(getent passwd alice)") == "1000")      // name -> uid
      assert(render("$(getent passwd 1000)") == "alice")      // uid -> name
      assert(render("$(getent passwd alice shell)") == "/bin/zsh")
      assert(render("$(getent passwd 0 dir)") == "/root")     // id key + member
      assert(render("$(getent passwd alice gecos)") == "Alice A.")
      assert(render("$(getent passwd nosuch)") == "")         // miss -> empty
    }
  }

  test("getent group: gid default, members list joins with comma") {
    withEtc {
      assert(render("$(getent group wheel)") == "10")
      assert(render("$(getent group 10)") == "wheel")
      assert(render("$(getent group wheel members)") == "alice,bob")
      assert(render("$(getent group root members)") == "")
    }
  }

  test("getent services/protocols: name<->number, aliases, proto ignored") {
    withEtc {
      assert(render("$(getent services syslog)") == "514")
      assert(render("$(getent services 514)") == "syslog")
      assert(render("$(getent services www)") == "80")        // alias
      assert(render("$(getent protocols tcp)") == "6")
      assert(render("$(getent protocols 1)") == "icmp")
    }
  }

  test("getent: dynamic key from a message column") {
    withEtc {
      assert(render("$(getent passwd $UID name)", "uid" -> "1000") == "alice")
    }
  }

  test("dns-resolve-ip: hit shortens at first dot unless use-fqdn") {
    withEtc {
      assert(render("$(dns-resolve-ip 10.0.0.7)") == "Web01")
      assert(render("$(dns-resolve-ip --use-fqdn yes 10.0.0.7)") ==
        "Web01.Example.Com")
      assert(render("$(dns-resolve-ip --use-fqdn yes --normalize-hostnames yes 10.0.0.7)") ==
        "web01.example.com")
    }
  }

  test("dns-resolve-ip: miss and use-dns(no) return the ip text unshortened") {
    withEtc {
      assert(render("$(dns-resolve-ip 192.168.9.9)") == "192.168.9.9")
      assert(render("$(dns-resolve-ip --use-dns no 10.0.0.7)") == "10.0.0.7")
      assert(render("$(dns-resolve-ip --use-dns=no 192.168.9.9)") == "192.168.9.9")
      // unparseable address -> empty (test_basicfuncs.c)
      assert(render("$(dns-resolve-ip !!!invalid-ip-address!!!)") == "")
      assert(render("$(dns-resolve-ip 1996::04:30)") == "1996::04:30")
    }
  }

  test("length and strip are multi-arg like the reference") {
    assert(render("$(length abcde fghij)", "x" -> "1") == "5 5")
    assert(render("$(strip '  a  b  ')", "x" -> "1") == "a  b")
    assert(render("$(strip '\t\n a  b \r\n ')", "x" -> "1") == "a  b")
    assert(render("$(strip '' ' value ' '')", "x" -> "1") == "value")
  }

  test("env: present values join with spaces, missing skip") {
    val k = sys.env.keys.find(k => k.matches("[A-Z_]+") &&
      !sys.env(k).isEmpty && !sys.env(k).contains("$")).get
    assert(render(s"$$(env $k)") == sys.env(k))
    assert(render("$(env GRAFT_NO_SUCH_VAR_12345)") == "")
  }
}
