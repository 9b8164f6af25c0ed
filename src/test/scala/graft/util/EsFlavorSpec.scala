package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's flavor-sniff + host normalization rules
  * (ZipkinElasticsearchStorage.java:38-162). */
class EsFlavorSpec extends AnyFunSuite {

  test("parseHosts: scheme defaulting, port defaulting, normalization") {
    assert(EsFlavor.parseHosts("127.0.0.1") == Seq("http://127.0.0.1:9200"))
    assert(EsFlavor.parseHosts("es1,es2:9201") ==
      Seq("http://es1:9200", "http://es2:9201"))
    // one https entry flips the default scheme for schemeless entries
    assert(EsFlavor.parseHosts("https://secure:443,plain") ==
      Seq("https://secure:443", "https://plain:9200"))
    assert(EsFlavor.parseHosts("http://h:9200") == Seq("http://h:9200"))
  }

  test("fromRootInfo: opensearch names a distribution, elasticsearch does not") {
    val os = """{"version":{"distribution":"opensearch","number":"2.11.0"}}"""
    assert(EsFlavor.fromRootInfo(os).contains("opensearch"))
    val es = """{"version":{"number":"8.11.0","build_flavor":"default"}}"""
    assert(EsFlavor.fromRootInfo(es).isEmpty)
    assert(EsFlavor.fromRootInfo("""{"version": {"distribution" : "OpenSearch"}}""")
      .contains("opensearch")) // lowercased, whitespace-tolerant
  }

  test("flavor: first responding host with a distribution wins; default elasticsearch") {
    val bodies = Map(
      "http://down:9200" -> None,
      "http://es:9200" -> Some("""{"version":{"number":"8.1.0"}}"""),
      "http://os:9200" -> Some("""{"version":{"distribution":"opensearch"}}"""))
    def fetch(h: String): Option[String] = bodies.getOrElse(h, None)
    assert(EsFlavor.flavor("down,os,es", fetch) == "opensearch")
    // es answers but names no distribution; default applies
    assert(EsFlavor.flavor("down,es", fetch) == "elasticsearch")
    assert(EsFlavor.flavor("down", fetch) == "elasticsearch")
  }

  test("esConf reads the reference's env surface with its defaults") {
    val c = EsFlavor.esConf(Map(
      "ES_HOSTS" -> "es1,es2:9400", "ES_USERNAME" -> "u", "ES_PASSWORD" -> "p",
      "ES_INDEX" -> "traces", "ES_NODES_WAN_ONLY" -> "true"))
    assert(c == EsFlavor.EsConf("traces",
      Seq("http://es1:9200", "http://es2:9400"), Some("u"), Some("p"), nodesWanOnly = true))
    val d = EsFlavor.esConf(Map())
    assert(d == EsFlavor.EsConf("zipkin", Seq("http://127.0.0.1:9200"), None, None, nodesWanOnly = false))
  }

  test("esConf: ES_TIMEOUT reaches the conf in millis; malformed fails loudly") {
    assert(EsFlavor.esConf(Map("ES_TIMEOUT" -> "30000")).timeoutMs == 30000L)
    assert(EsFlavor.esConf(Map()).timeoutMs == 10000L) // zipkin's default
    assert(EsFlavor.esConf(Map("ES_TIMEOUT" -> "")).timeoutMs == 10000L)
    // a typo'd value must not silently run with the default
    intercept[NumberFormatException](EsFlavor.esConf(Map("ES_TIMEOUT" -> "10s")))
  }
}
