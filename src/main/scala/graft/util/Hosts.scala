package graft.util

/** Connection-string parsing parity with the reference builders (P19/P20 —
  * cassandra3/.../CassandraDependenciesJob.java:234-251,
  * elasticsearch/.../ElasticsearchDependenciesJob.java:228-248,
  * main/.../ZipkinElasticsearchStorage.java:135-162): comma-separated
  * `host[:port]` lists, scheme-tolerant, with a default port. Pure functions.
  */
object Hosts {

  final case class HostPort(host: String, port: Int)

  /** "h1:9042,h2" → [HostPort(h1,9042), HostPort(h2,default)]. Accepts
    * optional `scheme://` prefixes and trailing paths (dropped), as the
    * reference's ES parsing does. IPv6 literals in brackets supported. */
  def parse(csv: String, defaultPort: Int): Seq[HostPort] =
    csv.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { raw =>
      val noScheme = raw.indexOf("://") match {
        case -1 => raw
        case i => raw.substring(i + 3)
      }
      val noPath = noScheme.indexOf('/') match {
        case -1 => noScheme
        case i => noScheme.substring(0, i)
      }
      if (noPath.startsWith("[")) { // ipv6
        val end = noPath.indexOf(']')
        val host = noPath.substring(1, end)
        val rest = noPath.substring(end + 1)
        if (rest.startsWith(":")) HostPort(host, rest.drop(1).toInt)
        else HostPort(host, defaultPort)
      } else noPath.split(":") match {
        case Array(h) => HostPort(h, defaultPort)
        case Array(h, p) => HostPort(h, p.toInt)
        case parts => HostPort(parts.dropRight(1).mkString(":"), parts.last.toInt)
      }
    }

  /** Render back to "host:port,host:port" (the reference's contact-points
    * normalization, CassandraDependenciesJob.java:244-251). */
  def render(hosts: Seq[HostPort]): String =
    hosts.map(h => s"${h.host}:${h.port}").mkString(",")
}
