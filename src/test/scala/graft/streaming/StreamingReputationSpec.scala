package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming reputation gate must make the exact q170 per-document
  * decision: same canonical host key, same 'q170'-salted 16-bit content
  * hash, same strict-under-threshold rule; unknown hosts reject. */
class StreamingReputationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  /** The q170 Bernoulli, replayed in plain Scala as the test oracle. */
  private def hv(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(("q170" + text).getBytes("UTF-8"))
    ((md(0) & 0xFFL) << 8) | (md(1) & 0xFFL)
  }

  test("streamed admissions equal the plain-Scala q170 rule, unknown hosts " +
      "reject, thresholds 0 and 65536 are never/always") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val thresholds = Seq(
      ("alpha.example.com", 65536L), // keep all
      ("beta.example.com", 0L),      // reject all
      ("gamma.example.com", 32768L)  // keep ~half, by content hash
    ).toDF("host", "t_u")
    val rows = (1 to 40).map { i =>
      val host = Seq("alpha", "beta", "gamma", "unknown")(i % 4)
      (i.toLong, s"HTTP://$host.Example.COM:80/p$i?utm_source=x", s"doc $i text")
    }
    val expected = rows.collect {
      case (id, url, text)
          if url.contains("alpha") ||
            (url.contains("gamma") && hv(text) < 32768L) => id
    }.toSet

    val input = MemoryStream[(Long, String, String)]
    val q = StreamingReputation.gate(
        input.toDS().toDF("doc_id", "url", "text"), thresholds)
      .select("doc_id")
      .writeStream.format("memory").queryName("rep_out")
      .outputMode("append").start()
    try {
      input.addData(rows.take(20): _*)
      q.processAllAvailable()
      input.addData(rows.drop(20): _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM rep_out").as[Long].collect().toSet
      assert(got == expected, s"gate divergence: $got vs $expected")
      // the fixture must exercise the partial-keep lane, not just 0/65536
      assert(expected.exists(i => i % 4 == 2),
        "fixture self-check: some gamma docs must pass")
    } finally q.stop()
    spark.sharedState.cacheManager.clearCache()
  }

  test("gate keeps the doc's other columns and derives the canonical host " +
      "through Urls.host (case/port/tracking noise ignored)") {
    import spark.implicits._
    val thresholds = Seq(("alpha.example.com", 65536L)).toDF("host", "t_u")
    val got = StreamingReputation.gate(
        Seq((7L, "HTTPS://ALPHA.Example.COM:443/x?utm_medium=z", "t", "keep"))
          .toDF("doc_id", "url", "text", "extra"),
        thresholds)
      .select("doc_id", "host", "extra")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((7L, "alpha.example.com", "keep")))
    spark.sharedState.cacheManager.clearCache()
  }
}
