package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture pins for the training-set assembly queries: the
  * dup-cluster split's zero-leak theorem (q175), the padding-waste
  * accounting (q176), the water-fill cap cascade's exact integer
  * arithmetic (q177), and the rank-defined percentile rule (q178). The
  * DuckDB oracles certify each at sf scale; these fix the intended math
  * on inputs small enough to verify by hand. */
class TrainPrepQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tprep").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q175: a near-dup pair always lands in ONE split (leak_pairs 0), " +
      "clusters counted once") {
    import spark.implicits._
    // docs 1/2 share all but one word (3-gram Jaccard well over 0.5);
    // doc 3 is unrelated. Whatever split the rep's hash draws, both
    // members inherit it — the zero-leak theorem, measured.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dir = docsDir(Seq(
      (1L, base + " one", "en", "A"),
      (2L, base + " two", "en", "A"),
      (3L, "completely different words about ships and harbors entirely", "en", "B")))
    val r = TrainPrepQueries.leakSafeSplit(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.map(_._2).sum == 3L, s"3 docs total, got $r")
    assert(r.map(_._4).sum == 2L, s"2 clusters (pair + singleton), got $r")
    assert(r.map(_._5).sum == 0L, s"cluster split must never leak, got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q176: length-sorted batching of a bimodal corpus pads ZERO; " +
      "totals are exact") {
    import spark.implicits._
    // 8 ten-word docs + 8 one-word docs, batch size 8: length order packs
    // each mode into its own batch — slot == real. Texts are all distinct
    // so the hash order is total.
    val long = (1 to 10).map(i => s"w$i").mkString(" ")
    val rows = (1L to 8L).map(i => (i, s"$long x$i", "en", "A")) ++
      (9L to 16L).map(i => (i, s"solo$i", "en", "A"))
    val dir = docsDir(rows)
    val r = TrainPrepQueries.paddingAudit(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    val sorted = r("length_sorted")
    // 8 docs of 11 tokens ("x$i" appends one) + 8 of 1 token
    assert(sorted == ("length_sorted", 2L, 96L, 96L, 0L, 0L), s"got $sorted")
    val hash = r("hash_order")
    assert(hash._3 == 96L && hash._4 >= sorted._4,
      s"hash order can only pad MORE, got $hash")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q177: two-source water-fill — the small source caps round 1, the " +
      "big source absorbs the leftover exactly to (not past) its cap") {
    import spark.implicits._
    // big = 100 tokens, small = 10. budget = 275; round 1 alloc = 137 →
    // small caps at 25; round 2 gives big (275-25)/1 = 250 = its cap
    // EXACTLY (alloc > cap is false → stays uncapped at 2.5 epochs).
    val dir = docsDir(Seq(
      (1L, (1 to 100).map(i => s"b$i").mkString(" "), "en", "big"),
      (2L, (1 to 10).map(i => s"s$i").mkString(" "), "en", "small")))
    val r = TrainPrepQueries.epochMix(spark, dir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(
      ("big", 100L, 250L, 2500000L, false),
      ("small", 10L, 25L, 2500000L, true)), s"got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q178: rank-defined percentiles on lengths 1..4 — P50 is the " +
      "ceil-rank value, never an interpolation") {
    import spark.implicits._
    val dir = docsDir(Seq(
      (1L, "a", "en", "A"),
      (2L, "a b", "en", "A"),
      (3L, "a b c", "en", "A"),
      (4L, "a b c d", "en", "A")))
    // n=4: P50 rank ceil(2)=2 → 2; P90 rank ceil(3.6)=4 → 4; P99 → 4.
    val r = TrainPrepQueries.lengthPercentiles(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("A", 4L, 2L, 4L, 4L, 4L)), s"got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q176 plan: every ranking window is partitioned by the range id — " +
      "no single-partition window (the final 2-row rollup's exchange is " +
      "the only global stage)") {
    val p = TrainPrepQueries.paddingAudit(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, s"expected ranking windows in the plan\n$p")
    windows.foreach { w =>
      assert(w.contains("_pid#"),
        s"a ranking window is not partitioned by the range id:\n$w")
    }
    spark.sharedState.cacheManager.clearCache()
  }
}
