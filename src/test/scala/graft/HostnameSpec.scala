package graft

import graft.template.Hostname
import org.scalatest.funsuite.AnyFunSuite

/** The hostname battery, ported from
  * `/root/reference/lib/tests/test_hostname.c` with the battery's
  * mocked gethostname "bzorp.balabit". */
class HostnameSpec extends AnyFunSuite {

  private def h(domainOverride: Option[String] = None) =
    Hostname("bzorp.balabit", domainOverride)

  test("fqdn conversion appends or replaces the domain (test_hostname.c:96-124)") {
    assert(h().fqdn("foo.bar") == "foo.bar")
    assert(h().fqdn("foo") == "foo.balabit")
    assert(h().fqdn("bzorp") == "bzorp.balabit")
    assert(h().fqdn("bzorp.balabit") == "bzorp.balabit")
    assert(h(Some("bardomain")).fqdn("bzorp") == "bzorp.bardomain")
    assert(h(Some("bardomain")).fqdn("bzorp.balabit") == "bzorp.bardomain")
    assert(h(Some("bardomain")).fqdn("foo") == "foo.bardomain")
    assert(h(Some("bardomain")).fqdn("foo.bar") == "foo.bardomain")
  }

  test("short conversion cuts at the first dot (test_hostname.c:126-152)") {
    for (o <- Seq(None, Some("bardomain"))) {
      assert(Hostname.short("foo") == "foo", o)
      assert(Hostname.short("foo.bar") == "foo", o)
      assert(Hostname.short("foo.bardomain") == "foo", o)
    }
  }

  test("local fqdn and short honor custom-domain (test_hostname.c:154-198)") {
    assert(h().localFqdn == "bzorp.balabit")
    assert(h(Some("bardomain")).localFqdn == "bzorp.bardomain")
    assert(h().localShort == "bzorp")
    assert(h(Some("bardomain")).localShort == "bzorp")
  }

  test("hostent FQDN extraction prefers qualified primary, then aliases (test_hostname.c:200-222)") {
    assert(Hostname.extractFqdnFromHostent("bzorp.balabit",
      Seq("bzorp", "bzorp.lan")) == Some("bzorp.balabit"))
    assert(Hostname.extractFqdnFromHostent("bzorp",
      Seq("bzorp", "bzorp.lan")) == Some("bzorp.lan"))
    assert(Hostname.extractFqdnFromHostent("bzorp",
      Seq("bzorp", "foobar")).isEmpty)
  }
}
