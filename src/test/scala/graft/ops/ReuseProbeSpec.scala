package graft.ops

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the cappedPairs multi-consumption contract: the upstream sketch
  * frame is cached, so every consuming branch (hot-key agg, join sides,
  * star) reads InMemoryTableScan instead of re-running the sketch scan —
  * AQE's broadcast conversion otherwise duplicates the subtree up to three
  * times (verified by plan inspection during round 2). */
class ReuseProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("simhash near-dups read the sketch from cache in every branch") {
    import spark.implicits._
    val docs = (0 until 300).map(i => (i.toLong, s"doc text number ${i % 200}")).toDF("doc_id", "text")
    val out = Dedup.simhashNearDups(docs, "text", "doc_id")
    val qe = out.queryExecution
    qe.executedPlan.executeCollect()
    val executed = qe.executedPlan.toString
    val cacheScans = "InMemoryTableScan|TableCacheQueryStage".r.findAllIn(executed).size
    assert(cacheScans >= 2, s"sketch frame must feed branches from cache\n$executed")
    spark.sharedState.cacheManager.clearCache()
  }
}
