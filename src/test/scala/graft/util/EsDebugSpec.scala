package graft.util

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayOutputStream, PrintStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** ES_DEBUG transport logging — the reference's troubleshooting knob
  * (README: set the log level to DEBUG "when troubleshooting"; the ES/OS
  * test containers expose it as ES_DEBUG) mapped onto per-request stderr
  * lines in [[EsHttpTransport]]. Pins: the env key reaches the conf, every
  * verb logs method/url/status/size/elapsed, failures log the exception
  * class, credentials and bodies never appear, and debug=false stays
  * silent. */
class EsDebugSpec extends AnyFunSuite {

  private def withServer(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      val bytes = """{"ok":true}""".getBytes(UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def capturingErr(body: => Unit): String = {
    val buf = new ByteArrayOutputStream()
    val saved = System.err
    System.setErr(new PrintStream(buf, true, "UTF-8"))
    try body finally System.setErr(saved)
    new String(buf.toByteArray, UTF_8)
  }

  test("ES_DEBUG=true reaches EsConf; anything else stays off") {
    assert(EsFlavor.esConf(Map("ES_DEBUG" -> "true")).debug)
    assert(!EsFlavor.esConf(Map("ES_DEBUG" -> "false")).debug)
    assert(!EsFlavor.esConf(Map("ES_DEBUG" -> "1")).debug)
    assert(!EsFlavor.esConf(Map()).debug)
  }

  test("debug=true logs one line per request — status, size, elapsed; " +
      "no body, no credentials") {
    withServer { base =>
      val t = new EsHttpTransport(Some("sekretuser"), Some("sekretpass"),
        10000L, debug = true)
      val err = capturingErr {
        assert(t.get(s"$base/probe").contains("""{"ok":true}"""))
        assert(t.post(s"$base/idx/_bulk", """{"secretdoc":1}""").isRight)
        assert(t.delete(s"$base/_search/scroll", """{"scroll_id":["a"]}""").isRight)
      }
      val lines = err.linesIterator.filter(_.startsWith("[es-debug]")).toSeq
      assert(lines.size == 3, s"expected 3 debug lines, got:\n$err")
      assert(lines(0).matches("""\[es-debug\] GET \S+/probe -> 200 \(11 bytes, \d+\.\d ms\)"""))
      assert(lines(1).contains("POST") && lines(1).contains("_bulk") &&
        lines(1).contains("-> 200"))
      assert(lines(2).contains("DELETE") && lines(2).contains("-> 200"))
      assert(!err.contains("sekret"), "credentials must never be logged")
      assert(!err.contains("secretdoc"), "request bodies must never be logged")
    }
  }

  test("debug=true logs the exception class on transport failure; " +
      "debug=false stays silent either way") {
    // unroutable port: connection refused surfaces as the exception line
    val t = new EsHttpTransport(None, None, 300L, debug = true)
    val err = capturingErr {
      assert(t.get("http://127.0.0.1:1/x").isEmpty)
    }
    assert(err.linesIterator.exists(l =>
      l.startsWith("[es-debug] GET http://127.0.0.1:1/x -> ") &&
        l.contains("Exception")), s"got:\n$err")
    withServer { base =>
      val quiet = new EsHttpTransport(None, None, 10000L)
      val err2 = capturingErr {
        assert(quiet.get(s"$base/").nonEmpty)
        assert(quiet.get("http://127.0.0.1:1/x").isEmpty)
      }
      assert(!err2.contains("[es-debug]"), s"debug=false must be silent:\n$err2")
    }
  }
}
