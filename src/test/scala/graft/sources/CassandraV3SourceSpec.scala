package graft.sources

import graft.pipeline.{Admission, LinkJob, SparkTestSession}
import graft.sources.CassandraV3Source.CassandraV3Config
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CassandraV3SourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("tokenRanges: contiguous, non-overlapping, covers the full signed-64 ring") {
    for (n <- Seq(1, 2, 4, 32)) {
      val rs = CassandraV3Source.tokenRanges(n)
      assert(rs.size == n)
      assert(rs.head._1 == Long.MinValue && rs.last._2 == Long.MaxValue)
      rs.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => assert(lo2 == hi + 1)
        case _ =>
      }
    }
    intercept[IllegalArgumentException](CassandraV3Source.tokenRanges(3))
  }

  test("rangeId agrees with tokenRanges bounds, including ring edges") {
    import spark.implicits._
    val n = 8
    val rs = CassandraV3Source.tokenRanges(n)
    val probe = rs.zipWithIndex.flatMap { case ((lo, hi), i) =>
      Seq(lo -> i, hi -> i) } :+ (0L -> n / 2)
    val got = probe.map(_._1).toDF("t")
      .select(CassandraV3Source.rangeId(col("t"), n).as("r")).as[Int].collect()
    assert(got.toSeq == probe.map(_._2))
  }

  test("rangeCql renders the live per-partition predicate, both bounds inclusive") {
    val cfg = CassandraV3Config(keyspace = "zipkin2", table = "span")
    val Seq((lo0, hi0), (lo1, hi1)) = CassandraV3Source.tokenRanges(2)
    assert(CassandraV3Source.rangeCql(cfg, lo0, hi0) ==
      s"SELECT * FROM zipkin2.span WHERE token(trace_id) >= $lo0 AND token(trace_id) <= $hi0")
    assert(CassandraV3Source.rangeCql(cfg, lo1, hi1) ==
      s"SELECT * FROM zipkin2.span WHERE token(trace_id) >= $lo1 AND token(trace_id) <= $hi1")
  }

  test("range predicates partition the ring: every token matches exactly one range") {
    // regression: an exclusive lower bound on these inclusive [lo, hi]
    // splits dropped the token at every interior boundary (n−1 tokens)
    val rs = CassandraV3Source.tokenRanges(8)
    // lo-1 of the first range wraps to Long.MaxValue — still a valid probe
    val boundary = rs.flatMap { case (lo, hi) => Seq(lo - 1, lo, lo + 1, hi - 1, hi) } ++
      Seq(0L, 1L, -1L)
    boundary.distinct.foreach { t =>
      val owners = rs.count { case (lo, hi) => t >= lo && t <= hi }
      assert(owners == 1, s"token $t owned by $owners ranges")
    }
  }

  private def spanRow(traceId: String, parentId: String, id: String, kind: String,
      ts: java.lang.Long, local: String, remote: String,
      tags: Map[String, String] = null, shared: Boolean = false): Row =
    Row(traceId, parentId, id, kind, ts, null,
      shared, Row(local), if (remote == null) null else Row(remote), tags)

  private def writeFixture(rows: Seq[Row]): String = {
    val dir = java.nio.file.Files.createTempDirectory("c3-fixture").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), CassandraV3Source.spanTableSchema)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("scan partitions hold contiguous, non-overlapping token spans (ring ownership)") {
    import spark.implicits._
    val rows = (0 until 200).map(i =>
      spanRow(f"$i%016x", null, f"$i%016x", "CLIENT", 1754870400000000L, s"svc$i", null))
    val dir = writeFixture(rows)
    val byPart = CassandraV3Source
      .scanSpanTable(spark, dir, CassandraV3Config(numRanges = 4))
      .select(spark_partition_id().as("p"), col("_token"))
      .groupBy("p").agg(min("_token").as("lo"), max("_token").as("hi"))
      .orderBy("lo")
      .as[(Int, Long, Long)].collect()
    assert(byPart.length > 1)
    byPart.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("decode parity: kind validation, error tag presence, endpoint services, shared") {
    import spark.implicits._
    val rows = Seq(
      spanRow("00000000000000aa", null, "0000000000000001", "CLIENT",
        1754870400000000L, "frontend", "backend", Map("error" -> "500")),
      spanRow("00000000000000aa", "0000000000000001", "0000000000000002", "bogus-kind",
        1754870400000001L, "backend", null, Map("other" -> "x"), shared = true),
      spanRow("00000000000000AA", "0000000000000001", "0000000000000003", null,
        null, "backend", "db"))
    val dir = writeFixture(rows)
    val spans = CassandraV3Source.spans(spark, dir, CassandraV3Config(numRanges = 2))
      .collect().sortBy(_.id)
    assert(spans.length == 3)
    assert(spans(0).kind.contains("CLIENT") && spans(0).errorTag)
    assert(spans(1).kind.isEmpty && !spans(1).errorTag && spans(1).shared)
    assert(spans(2).traceId == "00000000000000aa") // lowercased like every source
    assert(spans(2).remoteServiceName.contains("db") && spans(2).timestamp.isEmpty)
  }

  test("128-bit trace ids: low-64 unification by default, full-id separation under strict") {
    import spark.implicits._
    val ts = 1754870400000000L
    // two traces sharing the low 64 bits, differing in the high 64
    val rows = Seq(
      spanRow("111111110000000000000000000000aa", null, "0000000000000001", "CLIENT", ts, "a", "b"),
      spanRow("222222220000000000000000000000aa", null, "0000000000000002", "CLIENT", ts, "c", "d"))
    val dir = writeFixture(rows)
    def links(strict: Boolean) = LinkJob.linkSpans(
      CassandraV3Source.spans(spark, dir, CassandraV3Config(numRanges = 2)),
      "2025-08-11", Admission.IndexDay, strict = strict)
      .as[(String, String, Long, Long)].collect().toSet
    val spans = CassandraV3Source.spans(spark, dir, CassandraV3Config(numRanges = 2))
    assert(spans.collect().map(_.traceIdLow64).distinct.length == 1) // unified low-64
    assert(spans.collect().map(_.traceId).distinct.length == 2) // strict keys differ
    // strict: two independent single-span traces, each a root client link
    assert(links(strict = true) == Set(("a", "b", 1L, 0L), ("c", "d", 1L, 0L)))
    // low-64 merge: one trace, second parentless span attaches under the
    // root, so the root's client edge re-points at it (linker ancestor walk)
    assert(links(strict = false) == Set(("a", "c", 1L, 0L), ("c", "d", 1L, 0L)))
  }

  test("end-to-end: token-range source links a client/server day like the json path") {
    import spark.implicits._
    val ts = 1754870400000000L // inside 2025-08-11 UTC
    val rows = Seq(
      spanRow("00000000000000aa", null, "0000000000000001", "CLIENT", ts, "frontend", "backend"),
      spanRow("00000000000000aa", "0000000000000001", "0000000000000002", "SERVER",
        ts + 1000, "backend", null, Map("error" -> "true"), shared = true))
    val dir = writeFixture(rows)
    val links = LinkJob.linkSpans(
      CassandraV3Source.spans(spark, dir, CassandraV3Config(numRanges = 2)),
      "2025-08-11", Admission.RootInWindow)
      .as[(String, String, Long, Long)].collect().toSet
    assert(links == Set(("frontend", "backend", 1L, 1L)))
  }
}
