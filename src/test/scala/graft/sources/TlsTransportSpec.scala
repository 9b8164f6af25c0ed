package graft.sources

import graft.util.EsHttpTransport
import org.scalatest.funsuite.AnyFunSuite

import java.io.FileInputStream
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** TLS pins for the live transports — the scripted-socket done-bar applied
  * to the encrypted variants: a real TLS handshake against an in-JVM server
  * keyed from the checked-in self-signed PKCS12, then the normal wire
  * protocol on top. Covers CASSANDRA_USE_SSL (CqlClient over SSLSocket) and
  * the https EsHttpTransport path (JDK HttpClient + injected trust). */
class TlsTransportSpec extends AnyFunSuite {

  private def keystore(): KeyStore = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(
      getClass.getResource("/fixtures/graft-test.p12").getPath)
    try ks.load(in, "graftpass".toCharArray) finally in.close()
    ks
  }

  /** Server context: keyed with the fixture cert. */
  private def serverContext(): SSLContext = {
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(keystore(), "graftpass".toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client context: trusts exactly the fixture cert (no trust-all). */
  private def clientContext(): SSLContext = {
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(keystore())
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  test("CASSANDRA_USE_SSL: CQL round-trip over a real TLS handshake") {
    val ts = 1754870400000000L
    val rows = Seq(
      FRow(0L, "00000000000000aa", null, "0000000000000001",
        "CLIENT", ts, null, false, "frontend", "backend", null))
    val server = new ScriptedCassandra(rows, ssl = Some(serverContext()))
    // config-level plumb: fromEnv parses CASSANDRA_USE_SSL and connectAny
    // resolves the DEFAULT context, so the spec swaps the default for the
    // fixture-trusting one (restored in finally — JVM-global state)
    val prevDefault = SSLContext.getDefault
    SSLContext.setDefault(clientContext())
    try {
      val cfg = CassandraV3Source.fromEnv(Map(
        "CASSANDRA_USE_SSL" -> "true",
        "CASSANDRA_CONTACT_POINTS" -> s"127.0.0.1:${server.port}",
        "CASSANDRA_PAGE_SIZE" -> "100",
        "CASSANDRA_TIMEOUT" -> "5000"))
      assert(cfg.useSsl && cfg.pageSize == 100 && cfg.timeoutMs == 5000)
      val client = CassandraV3Source.connectAny(
        CassandraV3Source.contactPointList(cfg.contactPoints), cfg)
      try {
        val page = client.query(
          "SELECT trace_id FROM zipkin2.span", cfg.pageSize, None)
        assert(page.rows.size == 1)
        val cols = page.columns.map(_._1)
        assert(page.rows.head(cols.indexOf("trace_id")) == "00000000000000aa")
      } finally client.close()
    } finally {
      SSLContext.setDefault(prevDefault)
      server.stop()
    }
  }

  test("plaintext client against the TLS listener fails loudly, not silently") {
    val server = new ScriptedCassandra(Seq.empty, ssl = Some(serverContext()))
    try {
      intercept[java.io.IOException] {
        val c = new CqlClient("127.0.0.1", server.port, timeoutMs = 3000)
        c.close()
      }
    } finally server.stop()
  }

  test("https EsHttpTransport: GET and POST round-trip through a scripted TLS server") {
    val server = com.sun.net.httpserver.HttpsServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(
      new com.sun.net.httpserver.HttpsConfigurator(serverContext()))
    val posted = new java.util.concurrent.atomic.AtomicReference[String]()
    server.createContext("/", { exchange =>
      val body =
        if (exchange.getRequestMethod == "POST") {
          posted.set(new String(exchange.getRequestBody.readAllBytes(), "UTF-8"))
          """{"errors":false}"""
        } else """{"version":{"number":"8.0.0"}}"""
      val bytes = body.getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val base = s"https://127.0.0.1:${server.getAddress.getPort}"
      val transport = new EsHttpTransport(sslContext = Some(clientContext()))
      assert(transport.get(s"$base/").contains("""{"version":{"number":"8.0.0"}}"""))
      val resp = transport.post(s"$base/_bulk", "{\"index\":{}}\n{}\n")
      assert(resp == Right("""{"errors":false}"""))
      assert(posted.get() == "{\"index\":{}}\n{}\n")
      // without the fixture trust, the handshake is rejected (no trust-all
      // fallback hiding a bad cert) — get() surfaces that as None
      assert(new EsHttpTransport().get(s"$base/").isEmpty)
    } finally server.stop(0)
  }
}
