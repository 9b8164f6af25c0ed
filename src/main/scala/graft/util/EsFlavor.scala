package graft.util

/** Elasticsearch-vs-OpenSearch flavor detection and connection-env parity
  * with the reference launcher (P20 tail — main/.../ZipkinElasticsearchStorage
  * .java:38-128, elasticsearch/.../ElasticsearchDependenciesJob.java:54-67).
  *
  * The reference GETs each host's root document and matches
  * `"distribution"\s*:\s*"([^"]+)"` in the body (OpenSearch reports
  * `version.distribution: "opensearch"`; Elasticsearch has no distribution
  * field), defaulting to "elasticsearch" when nothing matches or no host
  * answers. The HTTP transport is injected here (`fetch`) so the probe logic
  * — host iteration, first-match-wins, lowercase, default — is testable
  * without a live cluster, and a real client can be dropped in unchanged.
  */
object EsFlavor {

  private val Distribution = "\"distribution\"\\s*[:]\\s*\"([^\"]+)\"".r

  /** Normalize an ES_HOSTS csv the way the reference does
    * (ZipkinElasticsearchStorage.parseHosts:135-162): if ANY entry names an
    * https scheme, schemeless entries default to https (else http); missing
    * ports default to 9200; output is `scheme://host:port`. */
  def parseHosts(csv: String): Seq[String] = {
    val parts = csv.split(",", -1).toSeq
    val defaultScheme = if (parts.exists(_.startsWith("https"))) "https" else "http"
    parts.map { raw =>
      val uri = java.net.URI.create(
        if (raw.startsWith("http")) raw else s"$defaultScheme://$raw")
      val port = if (uri.getPort == -1) 9200 else uri.getPort
      s"${uri.getScheme}://${uri.getHost}:$port"
    }
  }

  /** Flavor from one root-info response body. */
  def fromRootInfo(body: String): Option[String] =
    Distribution.findFirstMatchIn(body).map(_.group(1).toLowerCase)

  /** Walk the hosts, first body that names a distribution wins; unreachable
    * hosts (fetch = None) are skipped; default "elasticsearch" — exactly the
    * reference's fallback chain (:96-127). */
  def flavor(hostsCsv: String, fetch: String => Option[String]): String =
    parseHosts(hostsCsv).iterator
      .flatMap(h => fetch(h).flatMap(fromRootInfo))
      .nextOption()
      .getOrElse("elasticsearch")

  /** The ES connection surface the reference reads from env
    * (ElasticsearchDependenciesJob.java:54-67): index naming, hosts,
    * credentials, WAN-only flag, request timeout. Pure data for the
    * (stand-in) sinks. `timeoutMs` reaches every EsHttpTransport the
    * source/sink construct (connect + request timeout) — without it a slow
    * cluster could not be accommodated except by a code change. */
  final case class EsConf(
      index: String, hosts: Seq[String],
      username: Option[String], password: Option[String],
      nodesWanOnly: Boolean, timeoutMs: Long = 10000L,
      // ES_DEBUG=true: per-request transport logging on every
      // EsHttpTransport this conf constructs (source scroll + bulk sink)
      debug: Boolean = false)

  def esConf(env: Map[String, String]): EsConf = EsConf(
    index = env.getOrElse("ES_INDEX", "zipkin"),
    hosts = parseHosts(env.getOrElse("ES_HOSTS", "127.0.0.1")),
    username = env.get("ES_USERNAME").filter(_.nonEmpty),
    password = env.get("ES_PASSWORD").filter(_.nonEmpty),
    nodesWanOnly = env.getOrElse("ES_NODES_WAN_ONLY", "false") == "true",
    // millis, matching zipkin's ES_TIMEOUT convention; a malformed value
    // fails loudly here rather than silently running with the default
    timeoutMs = env.get("ES_TIMEOUT").filter(_.nonEmpty).map(_.toLong)
      .getOrElse(10000L),
    debug = env.getOrElse("ES_DEBUG", "false") == "true")
}
