package graft.link

import graft.model.{DependencyLink, Span}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fixture scenarios of FIXTURES.md §1.4 (mirror of the reference's
  * ITDependencies behaviors, SURVEY §5). Pure-Scala — no Spark session. */
class DependencyLinkerSpec extends AnyFunSuite {

  private val T = "00000000000000000000000000000a01"

  private def span(
      id: String,
      parentId: String = null,
      kind: String = null,
      local: String = null,
      remote: String = null,
      shared: Boolean = false,
      error: Boolean = false,
      ts: Option[Long] = Some(1000L),
      traceId: String = T
  ): Span = Span(traceId, Option(parentId), id, Option(kind), ts, None, shared,
    Option(local), Option(remote), error)

  private def links(spans: Span*): Seq[DependencyLink] = DependencyLinker.link(spans)

  test("trace_basic: client/server shared pair => one link, server authoritative") {
    val out = links(
      span("a", kind = "CLIENT", local = "frontend", remote = "backend"),
      span("a", kind = "SERVER", local = "backend", remote = "frontend", shared = true))
    assert(out == Seq(DependencyLink("frontend", "backend", 1, 0)))
  }

  test("trace_error_tags: error on child-side span counts; parent-side only does not") {
    val errOnServer = links(
      span("a", kind = "CLIENT", local = "frontend", remote = "backend"),
      span("a", kind = "SERVER", local = "backend", shared = true, error = true))
    assert(errOnServer == Seq(DependencyLink("frontend", "backend", 1, 1)))

    val errOnClientOnly = links(
      span("a", kind = "CLIENT", local = "frontend", remote = "backend", error = true),
      span("a", kind = "SERVER", local = "backend", shared = true))
    assert(errOnClientOnly == Seq(DependencyLink("frontend", "backend", 1, 0)))
  }

  test("trace_shared_merge: duplicate reports of same (id, shared) merge") {
    val out = links(
      span("a", kind = "CLIENT", local = "frontend", remote = "backend"),
      span("a", kind = "CLIENT", local = "frontend", remote = "backend"), // storage dupe
      span("a", kind = "SERVER", local = "backend", shared = true),
      span("a", kind = "SERVER", local = "backend", shared = true, error = true)) // retry write
    assert(out == Seq(DependencyLink("frontend", "backend", 1, 1)))
  }

  test("trace_dupe_spans: byte-identical span stored twice counted once") {
    val s = span("a", kind = "CLIENT", local = "frontend", remote = "backend")
    assert(links(s, s) == Seq(DependencyLink("frontend", "backend", 1, 0)))
  }

  test("trace_mixed_id_width: merge happens by span id; trace width at key level") {
    // both reports land in one group (pipeline keys by low-64); linker merges
    val out = links(
      span("a", kind = "CLIENT", local = "frontend", remote = "backend",
        traceId = "000000000000000000000000000000a1"),
      span("a", kind = "CLIENT", local = "frontend", remote = "backend",
        traceId = "00000000000000a1"))
    assert(out == Seq(DependencyLink("frontend", "backend", 1, 0)))
  }

  test("trace_headless: dangling parentId still links via synthetic root") {
    val out = links(
      span("b", parentId = "dead", kind = "CLIENT", local = "frontend", remote = "backend"),
      span("c", parentId = "dead", kind = "SERVER", local = "api", remote = "gw"))
    assert(out == Seq(
      DependencyLink("frontend", "backend", 1, 0),
      DependencyLink("gw", "api", 1, 0)))
  }

  test("trace_local_hop: remote-ancestor walk links across kind-less local span") {
    val out = links(
      span("a", kind = "SERVER", local = "frontend"),
      span("b", parentId = "a", local = "frontend"), // local span, no kind, no remote
      span("c", parentId = "b", kind = "CLIENT", local = "frontend", remote = "backend"))
    assert(out == Seq(DependencyLink("frontend", "backend", 1, 0)))
  }

  test("trace_local_hop: server child fills parent from nearest remote ancestor") {
    val out = links(
      span("a", kind = "SERVER", local = "frontend"),
      span("b", parentId = "a", local = "frontend"),
      span("c", parentId = "b", kind = "SERVER", local = "backend")) // no remoteEndpoint
    assert(out == Seq(DependencyLink("frontend", "backend", 1, 0)))
  }

  test("trace_uninstrumented_peer: client with remoteEndpoint only still links") {
    val out = links(
      span("a", kind = "CLIENT", local = "frontend", remote = "backend"))
    assert(out == Seq(DependencyLink("frontend", "backend", 1, 0)))
  }

  test("uninstrumented client: root server with remoteEndpoint (ca) links from peer") {
    val out = links(
      span("a", kind = "SERVER", local = "backend", remote = "frontend"))
    assert(out == Seq(DependencyLink("frontend", "backend", 1, 0)))
  }

  test("root server without remote peer produces no link") {
    assert(links(span("a", kind = "SERVER", local = "backend")).isEmpty)
  }

  test("trace_messaging: producer->broker and broker->consumer, no tree walk") {
    val out = links(
      span("a", kind = "PRODUCER", local = "producer", remote = "kafka"),
      span("b", parentId = "a", kind = "CONSUMER", local = "consumer", remote = "kafka"))
    assert(out == Seq(
      DependencyLink("kafka", "consumer", 1, 0),
      DependencyLink("producer", "kafka", 1, 0)))
  }

  test("messaging span missing broker endpoint yields no link") {
    assert(links(span("a", kind = "PRODUCER", local = "producer")).isEmpty)
  }

  test("trace_loopback: same service both sides preserved as self-link") {
    val out = links(
      span("a", kind = "CLIENT", local = "svc", remote = "svc"))
    assert(out == Seq(DependencyLink("svc", "svc", 1, 0)))
  }

  test("trace_client_with_children_skip: client span with server child => one link") {
    val out = links(
      span("a", kind = "CLIENT", local = "frontend", remote = "backend"),
      span("b", parentId = "a", kind = "SERVER", local = "backend"))
    assert(out == Seq(DependencyLink("frontend", "backend", 1, 0)))
  }

  test("kind-less span with both endpoints treated as client") {
    val out = links(span("a", local = "frontend", remote = "backend"))
    assert(out == Seq(DependencyLink("frontend", "backend", 1, 0)))
  }

  test("kind-less span missing a side is skipped (pure local)") {
    assert(links(span("a", local = "frontend")).isEmpty)
  }

  test("multi-hop chain: three services, two links, counts sum within trace") {
    val out = links(
      span("a", kind = "SERVER", local = "gw", remote = "user"),
      span("b", parentId = "a", kind = "CLIENT", local = "gw", remote = "api"),
      span("b", kind = "SERVER", local = "api", shared = true),
      span("c", parentId = "b", kind = "CLIENT", local = "api", remote = "db"),
      span("c", kind = "SERVER", local = "db", shared = true, error = true))
    assert(out == Seq(
      DependencyLink("api", "db", 1, 1),
      DependencyLink("gw", "api", 1, 0),
      DependencyLink("user", "gw", 1, 0)))
  }

  test("output independent of span input order") {
    val spans = Seq(
      span("a", kind = "SERVER", local = "gw", remote = "user"),
      span("b", parentId = "a", kind = "CLIENT", local = "gw", remote = "api"),
      span("b", kind = "SERVER", local = "api", shared = true),
      span("c", parentId = "b", kind = "CLIENT", local = "api", remote = "db"))
    val expect = DependencyLinker.link(spans)
    spans.permutations.take(24).foreach { p =>
      assert(DependencyLinker.link(p) == expect)
    }
  }

  test("empty and single-local traces yield no links") {
    assert(links().isEmpty)
    assert(links(span("a", local = "only")).isEmpty)
  }
}
