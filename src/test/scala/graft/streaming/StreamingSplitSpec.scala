package graft.streaming

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The split-consistent admission mirror must preserve q175's no-leak
  * guarantee incrementally: arriving near-dups of corpus docs INHERIT the
  * corpus split, within-batch near-dups land together, conflicting
  * anchors quarantine the whole component, and genuinely novel docs take
  * the q175 rep-hash rule. */
class StreamingSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  private def corpusDf = {
    import spark.implicits._
    Seq(
      (1L, base + " one", "test"),
      (2L, "ships harbors anchors sails masts riggings keels rudders decks holds", "train"))
      .toDF("doc_id", "text", "split")
  }

  test("a near-dup of a corpus doc INHERITS the corpus split; a novel doc " +
      "takes the hash rule; within-batch near-dups share one split") {
    import spark.implicits._
    val batch = Seq(
      (101L, base + " three"),                      // near-dup of corpus 1
      (102L, "entirely novel words about volcanic islands and basalt cliffs rising"),
      (103L, "quick brown foxes jump over lazy dogs beside quiet rivers today extra"),
      (104L, "quick brown foxes jump over lazy dogs beside quiet rivers today bonus"))
      .toDF("doc_id", "text")
    val r = StreamingSplit.assignBatch(corpusDf, batch, weights)
      .as[(Long, String, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(101L) == ("test", "inherited"), s"got ${r(101L)}")
    assert(r(102L)._2 == "novel" && weights.map(_._1).contains(r(102L)._1),
      s"got ${r(102L)}")
    // 103/104 differ in one trailing word (3-gram J = 9/11 > 0.5): same
    // component, same split, both novel
    assert(r(103L) == r(104L) && r(103L)._2 == "novel", s"got ${r(103L)} ${r(104L)}")
    spark.sharedState.cacheManager.clearCache()
  }

  test("a doc bridging two corpus clusters with DIFFERENT splits is " +
      "quarantined — any assignment would leak against one side") {
    import spark.implicits._
    val aWords = (1 to 10).map(i => s"apple$i").mkString(" ")
    val bWords = (1 to 10).map(i => s"brick$i").mkString(" ")
    val corpus = Seq(
      (1L, aWords, "train"), (2L, bWords, "test")).toDF("doc_id", "text", "split")
    // the bridge holds both word runs: J(bridge, A) = 8/18 vs each side —
    // over the 0.3 threshold; rows=1 banding (bands=k) makes the candidate
    // join a per-minhash match (miss probability (1-J)^64 ~ 0)
    val batch = Seq((101L, aWords + " " + bWords)).toDF("doc_id", "text")
    val r = StreamingSplit.assignBatch(corpus, batch, weights,
        bands = 64, threshold = 0.3)
      .as[(Long, String, String)].collect().toSeq
    assert(r == Seq((101L, "quarantine", "quarantine")), s"got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("no-leak invariant over batch ∪ corpus: every assigned batch doc " +
      "agrees with every verified corpus match (measured, not assumed)") {
    import spark.implicits._
    // 8 arrivals: 4 near-dups of corpus docs, 4 novel
    val batch = ((0 until 4).map(i => (200L + i, base + s" variant$i")) ++
      (0 until 4).map(i => (300L + i, s"novel text number$i with distinct content words entirely unlike others")))
      .toDF("doc_id", "text")
    val out = StreamingSplit.assignBatch(corpusDf, batch, weights)
    val joined = out.where(org.apache.spark.sql.functions.col("mode") === "inherited")
      .as[(Long, String, String)].collect()
    assert(joined.nonEmpty, "fixture self-check: some docs must inherit")
    // every inherited doc is a near-dup of corpus doc 1 (split 'test')
    joined.foreach { case (id, split, _) =>
      assert(split == "test", s"doc $id leaked to $split against corpus 'test'") }
    spark.sharedState.cacheManager.clearCache()
  }

  test("the hot-bucket cap keeps a witness PER SPLIT: a bridge doc is " +
      "quarantined even when the bucket overflows (capped-witness regression)") {
    import spark.implicits._
    // two IDENTICAL corpus docs carrying different splits share every band
    // bucket; maxBucket=1 forces the cap. The old smallest-ids-only rule
    // dropped doc 2's 'test' witness from every bucket, so the bridging
    // batch doc read as single-anchor 'inherited' train — the exact leak
    // the invariant forbids. Per-split capping keeps one witness of EACH
    // split, so the conflict is seen and the verdict is quarantine.
    val words = (1 to 12).map(i => s"word$i").mkString(" ")
    val corpus = Seq((1L, words, "train"), (2L, words, "test"))
      .toDF("doc_id", "text", "split")
    val batch = Seq((101L, words)).toDF("doc_id", "text")
    val r = StreamingSplit.assignBatch(corpus, batch, weights, maxBucket = 1)
      .as[(Long, String, String)].collect().toSeq
    assert(r == Seq((101L, "quarantine", "quarantine")), s"got $r")
    spark.sharedState.cacheManager.clearCache()
  }

  test("assignBatchHandle: the returned frames are the run's persisted " +
      "intermediates; unpersisting them leaves the cache as found") {
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    // a standing corpus index a long-lived caller keeps cached must
    // SURVIVE per-batch cleanup (the clearCache() hazard the handle avoids)
    val standing = corpusDf.persist()
    standing.count()
    val batch = Seq((101L, base + " three")).toDF("doc_id", "text")
    val (out, cached) = StreamingSplit.assignBatchHandle(standing, batch, weights)
    assert(out.count() == 1)
    assert(cached.size == 2)
    cached.foreach(_.unpersist(blocking = true))
    assert(cached.forall(_.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE))
    assert(standing.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE,
      "per-batch cleanup must not evict the standing corpus cache")
    standing.unpersist(blocking = true)
    spark.sharedState.cacheManager.clearCache()
  }

  test("foreachBatch deployment: streamed micro-batches produce exactly " +
      "the static assignment (batch-parity pin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((101L, base + " three"),
      (102L, "entirely novel words about volcanic islands and basalt cliffs rising"))
    val staticOut = StreamingSplit.assignBatch(
        corpusDf, rows.toDF("doc_id", "text"), weights)
      .as[(Long, String, String)].collect().toSet
    val acc = scala.collection.mutable.Set.empty[(Long, String, String)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        acc ++= StreamingSplit.assignBatch(corpusDf, df, weights)
          .as[(Long, String, String)].collect()
        ()
      }.start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(acc.toSet == staticOut, s"stream $acc vs static $staticOut")
    spark.sharedState.cacheManager.clearCache()
  }
}
