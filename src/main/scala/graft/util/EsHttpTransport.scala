package graft.util

import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

/** The production HTTP client behind [[EsFlavor]]'s injectable `fetch` and
  * the ES `_bulk` sink (graft.sinks.EsBulkSink) — plain JDK `java.net.http`,
  * no connector library. Mirrors the transport behavior the reference gets
  * from okhttp + es-hadoop: basic-auth header when credentials are set
  * (ElasticsearchDependenciesJob.java:161-162 routes ES_USERNAME/ES_PASSWORD
  * into es.net.http.auth.*; ElasticsearchDependenciesJobTest.authWorks pins
  * the `Authorization: Basic base64(user:pass)` shape), non-2xx and IO
  * failures surfaced as absent/Left so callers can fail over to the next
  * host.
  *
  * Serializable so executor-side sinks can ship it in a closure; the client
  * itself is @transient lazy — each executor builds its own. */
final class EsHttpTransport(
    username: Option[String] = None,
    password: Option[String] = None,
    val timeoutMs: Long = 10000L,
    // https trust seam: an injected SSLContext (scripted TLS specs); when
    // absent — including executor-side after deserialization, where the
    // transient field revives as null — the JDK default context applies,
    // configured by the standard javax.net.ssl.* system properties. An
    // https:// host in ES_HOSTS needs no code change either way.
    @transient private val sslContext: Option[javax.net.ssl.SSLContext] = None,
    // ES_DEBUG=true (the reference container's troubleshooting knob):
    // one stderr line per request — method, url, outcome, body size,
    // elapsed — on the executor that issued it. Never the body itself
    // (bulk payloads carry span data) and never the Authorization header.
    val debug: Boolean = false)
    extends Serializable {

  private val authHeader: Option[String] = username.map { u =>
    val creds = s"$u:${password.getOrElse("")}"
    "Basic " + java.util.Base64.getEncoder.encodeToString(creds.getBytes(UTF_8))
  }

  @transient private lazy val client: HttpClient = {
    val b = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    Option(sslContext).flatten.fold(b)(b.sslContext).build()
  }

  private def request(url: String): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
    authHeader.fold(b)(h => b.header("Authorization", h))
  }

  /** One ES_DEBUG stderr line per request: status or exception class, the
    * response size, and wall time — nanoTime deltas, no body, no creds. */
  private def traced[A](method: String, url: String)(
      send: => HttpResponse[String])(ok: HttpResponse[String] => A)(
      err: Exception => A): A =
    if (!debug) {
      try ok(send) catch { case e: Exception => err(e) }
    } else {
      val t0 = System.nanoTime()
      try {
        val resp = send
        System.err.println(f"[es-debug] $method $url -> ${resp.statusCode()} " +
          f"(${resp.body().length} bytes, ${(System.nanoTime() - t0) / 1e6}%.1f ms)")
        ok(resp)
      } catch {
        case e: Exception =>
          System.err.println(f"[es-debug] $method $url -> " +
            f"${e.getClass.getSimpleName}: ${e.getMessage} " +
            f"(${(System.nanoTime() - t0) / 1e6}%.1f ms)")
          err(e)
      }
    }

  /** GET a url; Some(body) on 2xx, None otherwise (unreachable host, auth
    * failure, …) — exactly the contract EsFlavor.flavor skips over. */
  def get(url: String): Option[String] =
    traced("GET", url)(client.send(request(url).GET().build(),
      HttpResponse.BodyHandlers.ofString())) { resp =>
      if (resp.statusCode() / 100 == 2) Some(resp.body()) else None
    }(_ => None)

  /** POST a body; Right(responseBody) on 2xx, Left(reason) otherwise. */
  def post(url: String, body: String,
      contentType: String = "application/x-ndjson"): Either[String, String] =
    traced("POST", url)(client.send(
      request(url)
        .header("Content-Type", contentType)
        .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())) { resp =>
      if (resp.statusCode() / 100 == 2) Right(resp.body())
      else Left(s"HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    }(e => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}"))

  /** DELETE with a body (ES clear-scroll shape); outcome-reported, never
    * throws — callers treat cleanup as best-effort. */
  def delete(url: String, body: String,
      contentType: String = "application/json"): Either[String, String] =
    traced("DELETE", url)(client.send(
      request(url)
        .header("Content-Type", contentType)
        .method("DELETE", HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())) { resp =>
      if (resp.statusCode() / 100 == 2) Right(resp.body())
      else Left(s"HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    }(e => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
}
