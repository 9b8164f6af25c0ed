package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** P19/P20 parity: connection-string parsing behaviors of the reference
  * builders (CassandraDependenciesJobTest.java:14-42,
  * ElasticsearchDependenciesJobTest.java:88-103). */
class HostsSpec extends AnyFunSuite {
  import Hosts._

  test("bare host gets default port") {
    assert(parse("cassandra", 9042) == Seq(HostPort("cassandra", 9042)))
  }

  test("explicit ports and mixed lists") {
    assert(parse("host1:9143,host2,host3:9145", 9042) == Seq(
      HostPort("host1", 9143), HostPort("host2", 9042), HostPort("host3", 9145)))
  }

  test("scheme and path are stripped (ES-style urls)") {
    assert(parse("http://es1:9200/_index,https://es2", 9200) == Seq(
      HostPort("es1", 9200), HostPort("es2", 9200)))
  }

  test("ipv6 literals") {
    assert(parse("[2001:db8::1]:9042,[::1]", 9042) == Seq(
      HostPort("2001:db8::1", 9042), HostPort("::1", 9042)))
  }

  test("whitespace and empties tolerated; render round-trips") {
    val hs = parse(" a:1 , ,b ", 7)
    assert(hs == Seq(HostPort("a", 1), HostPort("b", 7)))
    assert(render(hs) == "a:1,b:7")
  }
}
