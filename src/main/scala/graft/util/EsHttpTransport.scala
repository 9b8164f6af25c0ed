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
    @transient private val sslContext: Option[javax.net.ssl.SSLContext] = None)
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

  /** GET a url; Some(body) on 2xx, None otherwise (unreachable host, auth
    * failure, …) — exactly the contract EsFlavor.flavor skips over. */
  def get(url: String): Option[String] =
    try {
      val resp = client.send(request(url).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2) Some(resp.body()) else None
    } catch { case _: Exception => None }

  /** POST a body; Right(responseBody) on 2xx, Left(reason) otherwise. */
  def post(url: String, body: String,
      contentType: String = "application/x-ndjson"): Either[String, String] =
    try {
      val resp = client.send(
        request(url)
          .header("Content-Type", contentType)
          .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2) Right(resp.body())
      else Left(s"HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    } catch { case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }

  /** DELETE with a body (ES clear-scroll shape); outcome-reported, never
    * throws — callers treat cleanup as best-effort. */
  def delete(url: String, body: String,
      contentType: String = "application/json"): Either[String, String] =
    try {
      val resp = client.send(
        request(url)
          .header("Content-Type", contentType)
          .method("DELETE", HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2) Right(resp.body())
      else Left(s"HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    } catch { case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
}
