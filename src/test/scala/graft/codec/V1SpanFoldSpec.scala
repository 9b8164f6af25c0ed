package graft.codec

import graft.link.DependencyLinker
import graft.model.DependencyLink
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Pins M2 (v1 annotation fold) semantics per FIXTURES.md §1.2 and the
  * reference's DependencyLinkSpanIterator behaviors. */
class V1SpanFoldSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def rowsDf(rows: Seq[(java.lang.Long, Long, java.lang.Long, Long, String, String, Int, java.lang.Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("trace_id_high", "trace_id", "parent_id", "id", "a_key",
      "endpoint_service_name", "a_type", "start_ts")
  }

  private def fold(rows: Seq[(java.lang.Long, Long, java.lang.Long, Long, String, String, Int, java.lang.Long)]) =
    V1SpanFold.fold(rowsDf(rows)).collect().toSeq

  private val EVENT = -1 // v1 annotation (not a tag)
  private val STRING = 6 // binary annotation / tag

  test("cs+sr same span id folds to one SERVER span; links client->server") {
    val spans = fold(Seq(
      (null, 1L, null, 10L, "cs", "frontend", EVENT, 1000L),
      (null, 1L, null, 10L, "sr", "backend", EVENT, 1001L)))
    assert(spans.size == 1)
    val s = spans.head
    assert(s.kind.contains("SERVER"))
    assert(s.localServiceName.contains("backend"))
    assert(s.remoteServiceName.contains("frontend")) // ca defaulted to cs owner
    assert(DependencyLinker.link(spans) == Seq(DependencyLink("frontend", "backend", 1, 0)))
  }

  test("sa-only span (uninstrumented server): client span with remote=sa") {
    val spans = fold(Seq(
      (null, 1L, null, 10L, "cs", "frontend", EVENT, 1000L),
      (null, 1L, null, 10L, "sa", "backend", EVENT, 1000L)))
    val s = spans.head
    assert(s.kind.contains("CLIENT")) // cs present => CLIENT
    assert(s.localServiceName.contains("frontend"))
    assert(s.remoteServiceName.contains("backend"))
  }

  test("sa without cs: kind unset, local falls back to lc") {
    val spans = fold(Seq(
      (null, 1L, null, 10L, "lc", "local-app", EVENT, 1000L),
      (null, 1L, null, 10L, "sa", "backend", EVENT, 1000L)))
    val s = spans.head
    assert(s.kind.isEmpty)
    assert(s.localServiceName.contains("local-app"))
    assert(s.remoteServiceName.contains("backend"))
  }

  test("Finagle loopback guard: sa == ca drops ca") {
    val spans = fold(Seq(
      (null, 1L, null, 10L, "ca", "svc", EVENT, 1000L),
      (null, 1L, null, 10L, "lc", "other", EVENT, 1000L),
      (null, 1L, null, 10L, "sa", "svc", EVENT, 1000L)))
    val s = spans.head
    assert(s.localServiceName.contains("other")) // ca dropped, lc used
    assert(s.remoteServiceName.contains("svc"))
  }

  test("cs-only span: SERVER with local=ca") {
    val spans = fold(Seq(
      (null, 1L, null, 10L, "cs", "frontend", EVENT, 1000L)))
    val s = spans.head
    assert(s.kind.contains("SERVER"))
    assert(s.localServiceName.contains("frontend")) // ca defaulted from cs
    assert(s.remoteServiceName.isEmpty)
  }

  test("messaging: mr => CONSUMER(local=mr, remote=ma); ms => PRODUCER") {
    val consumer = fold(Seq(
      (null, 1L, null, 10L, "mr", "consumer-svc", EVENT, 1000L),
      (null, 1L, null, 10L, "ma", "kafka", EVENT, 1000L))).head
    assert(consumer.kind.contains("CONSUMER"))
    assert(consumer.localServiceName.contains("consumer-svc"))
    assert(consumer.remoteServiceName.contains("kafka"))

    val producer = fold(Seq(
      (null, 2L, null, 11L, "ms", "producer-svc", EVENT, 1000L),
      (null, 2L, null, 11L, "ma", "kafka", EVENT, 1000L))).head
    assert(producer.kind.contains("PRODUCER"))
    assert(producer.localServiceName.contains("producer-svc"))
    assert(producer.remoteServiceName.contains("kafka"))
  }

  test("error counts only as a STRING tag (a_type=6), not an event annotation") {
    val tagged = fold(Seq(
      (null, 1L, null, 10L, "cs", "frontend", EVENT, 1000L),
      (null, 1L, null, 10L, "error", "frontend", STRING, 1000L))).head
    assert(tagged.errorTag)
    val event = fold(Seq(
      (null, 2L, null, 11L, "cs", "frontend", EVENT, 1000L),
      (null, 2L, null, 11L, "error", "frontend", EVENT, 1000L))).head
    assert(!event.errorTag)
  }

  test("trace_id_high ignored: mixed-width reports fold into one trace") {
    val spans = fold(Seq(
      (java.lang.Long.valueOf(99L), 1L, null, 10L, "cs", "frontend", EVENT, 1000L),
      (null, 1L, null, 10L, "sr", "backend", EVENT, 1000L)))
    assert(spans.size == 1) // same (trace_id, id) despite different high bits
  }

  test("parent_id 0 or null means root") {
    val root = fold(Seq((null, 1L, null, 10L, "cs", "a", EVENT, 1000L))).head
    assert(root.parentId.isEmpty)
    val child = fold(Seq((null, 1L, java.lang.Long.valueOf(10L), 11L, "cs", "a", EVENT, 1000L))).head
    assert(child.parentId.contains("000000000000000a"))
  }

  test("empty service names are ignored") {
    val s = fold(Seq(
      (null, 1L, null, 10L, "cs", "", EVENT, 1000L),
      (null, 1L, null, 10L, "sa", "backend", EVENT, 1000L))).head
    assert(s.kind.isEmpty) // cs with empty service = no cs
    assert(s.remoteServiceName.contains("backend"))
  }

  test("fold output independent of row order") {
    val rows = Seq(
      (null.asInstanceOf[java.lang.Long], 1L, null.asInstanceOf[java.lang.Long], 10L, "cs", "frontend", EVENT, java.lang.Long.valueOf(1000L)),
      (null.asInstanceOf[java.lang.Long], 1L, null.asInstanceOf[java.lang.Long], 10L, "sr", "backend", EVENT, java.lang.Long.valueOf(1001L)),
      (null.asInstanceOf[java.lang.Long], 1L, java.lang.Long.valueOf(10L), 11L, "cs", "backend", EVENT, java.lang.Long.valueOf(1002L)),
      (null.asInstanceOf[java.lang.Long], 1L, java.lang.Long.valueOf(10L), 11L, "sa", "db", EVENT, java.lang.Long.valueOf(1003L)))
    val a = V1SpanFold.fold(rowsDf(rows)).collect().sortBy(_.id).toSeq
    val b = V1SpanFold.fold(rowsDf(rows.reverse)).collect().sortBy(_.id).toSeq
    assert(a == b)
    val links = DependencyLinker.link(a)
    assert(links == Seq(
      DependencyLink("backend", "db", 1, 0),
      DependencyLink("frontend", "backend", 1, 0)))
  }

  test("error tag with null or empty endpoint does NOT mark the span errored") {
    // reference skips key-or-value-null rows before its switch
    // (DependencyLinkSpanIterator.java:94)
    val nullEp = fold(Seq(
      (null, 1L, null, 10L, "cs", "frontend", EVENT, 1000L),
      (null, 1L, null, 10L, "error", null, STRING, 1000L))).head
    assert(!nullEp.errorTag)
    val emptyEp = fold(Seq(
      (null, 2L, null, 11L, "cs", "frontend", EVENT, 1000L),
      (null, 2L, null, 11L, "error", "", STRING, 1000L))).head
    assert(!emptyEp.errorTag)
    val withEp = fold(Seq(
      (null, 3L, null, 12L, "cs", "frontend", EVENT, 1000L),
      (null, 3L, null, 12L, "error", "frontend", STRING, 1000L))).head
    assert(withEp.errorTag)
  }

  test("M1 two-table join: same links as the pre-joined tall-row path") {
    import spark.implicits._
    // zipkin_spans: a 3-span chain inside the window + one span outside it
    val spansT = Seq(
      (1L, null.asInstanceOf[java.lang.Long], 10L, java.lang.Long.valueOf(1000L)),
      (1L, java.lang.Long.valueOf(10L), 11L, java.lang.Long.valueOf(1100L)),
      (1L, java.lang.Long.valueOf(11L), 12L, java.lang.Long.valueOf(1200L)),
      (1L, java.lang.Long.valueOf(12L), 13L, java.lang.Long.valueOf(999999L)))
      .toDF("trace_id", "parent_id", "id", "start_ts")
    // zipkin_annotations: cs/sr pairs, a non-core key (filtered), a
    // null-endpoint error (ignored), a real error tag on span 12
    val annos = Seq(
      (1L, 10L, "cs", "frontend", EVENT),
      (1L, 11L, "sr", "backend", EVENT),
      (1L, 11L, "ca", "frontend", EVENT),
      (1L, 11L, "http.path", "/api", STRING),
      (1L, 12L, "sr", "db", EVENT),
      (1L, 12L, "ca", "backend", EVENT),
      (1L, 12L, "error", null.asInstanceOf[String], STRING),
      (1L, 12L, "error", "db", STRING),
      (1L, 13L, "sr", "late", EVENT))
      .toDF("trace_id", "span_id", "a_key", "endpoint_service_name", "a_type")
    val spans = V1SpanFold.fromV1Tables(spansT, annos, 0L, 10000L).collect().toSeq
    assert(spans.map(_.id).sorted ==
      Seq("000000000000000a", "000000000000000b", "000000000000000c"))
    val links = DependencyLinker.link(spans)
    assert(links == Seq(
      DependencyLink("backend", "db", 1, 1),
      DependencyLink("frontend", "backend", 1, 0)))

    // equivalence: the identical tall relation produces the identical spans
    val tall = rowsDf(Seq(
      (null, 1L, null, 10L, "cs", "frontend", EVENT, 1000L),
      (null, 1L, java.lang.Long.valueOf(10L), 11L, "sr", "backend", EVENT, 1100L),
      (null, 1L, java.lang.Long.valueOf(10L), 11L, "ca", "frontend", EVENT, 1100L),
      (null, 1L, java.lang.Long.valueOf(11L), 12L, "sr", "db", EVENT, 1200L),
      (null, 1L, java.lang.Long.valueOf(11L), 12L, "ca", "backend", EVENT, 1200L),
      (null, 1L, java.lang.Long.valueOf(11L), 12L, "error", null, STRING, 1200L),
      (null, 1L, java.lang.Long.valueOf(11L), 12L, "error", "db", STRING, 1200L)))
    val viaTall = V1SpanFold.fold(tall).collect().toSeq.sortBy(_.id)
    assert(spans.sortBy(_.id) == viaTall)
  }

  test("per-span window filter drops out-of-window spans before folding") {
    val spans = V1SpanFold.foldWindow(rowsDf(Seq(
      (null, 1L, null, 10L, "cs", "in-window", EVENT, 5000L),
      (null, 1L, null, 11L, "cs", "too-late", EVENT, 99000L))), 0L, 10000L)
      .collect().toSeq
    assert(spans.map(_.localServiceName.get) == Seq("in-window"))
  }
}
