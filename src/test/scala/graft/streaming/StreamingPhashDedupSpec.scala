package graft.streaming

import graft.ops.Multimodal
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingPhashDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)

  private def payloadFor(bits: Long): Array[Byte] = graft.TestRefs.payloadFor(bits)

  private val p = 0x5A5A5A5A5A5A5A5AL
  private val near = p ^ 3L // hamming 2, both flips in band 3
  private val far = p ^ 0x1F001F001F001F00L // 5 flips per band: no collision

  // same planted corpus as the batch q122 spec
  private val assets = Seq(
    (1L, payloadFor(p), "image"),
    (2L, payloadFor(near), "image"),
    (3L, payloadFor(p), "image"), // exact dup of 1
    (4L, payloadFor(far), "image"),
    (5L, payloadFor(p), "audio")) // same hash, other modality

  test("in-order stream rejects exactly the batch near-pair larger sides, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Array[Byte], String)]
    val docs = input.toDS().toDF("asset_id", "ts", "payload", "modality")
    val query = StreamingPhashDedup.nearDupRejections(
      docs, modalityCol = "modality")
      .writeStream.format("memory").queryName("phash_out")
      .outputMode("append").start()
    try {
      val events = assets.zipWithIndex.map { case ((id, pl, m), i) => (id, ts(i), pl, m) }
      input.addData(events.take(2): _*)
      query.processAllAvailable()
      input.addData(events.drop(2): _*)
      query.processAllAvailable()
      val rows = spark.sql("SELECT assetId, band, priorId, hamming FROM phash_out")
        .as[(Long, Int, Long, Int)].collect().toSeq
      // batch near pairs are (1,2),(1,3),(2,3): streamed rejections are the
      // larger sides {2,3}, each witnessed by the earliest bucket member
      assert(rows.map(_._1).toSet == Set(2L, 3L))
      val byAsset = rows.groupBy(_._1)
      // asset 2 collides with 1 in the three bands its flips are NOT in
      assert(byAsset(2L).map(_._2).sorted == Seq(0, 1, 2))
      assert(byAsset(2L).forall(r => r._3 == 1L && r._4 == 2))
      // asset 3 is an exact dup: all four bands, witness 1 (earliest, d=0
      // beats asset 2 only by arrival order — the iterator is state order)
      assert(byAsset(3L).map(_._2).sorted == Seq(0, 1, 2, 3))
      assert(byAsset(3L).forall(r => r._3 == 1L && r._4 == 0))
      // the batch report agrees: 3 near pairs / 3 near assets in image
      val batch = Multimodal.phashNearDupReport(
        assets.toDF("asset_id", "payload", "m")
          .select(col("asset_id"), col("payload"),
            struct(col("m").as("modality"), lit("png").as("format"),
              lit(8).as("width"), lit(4).as("height"), lit(0L).as("durationMs"),
              length(col("payload")).cast("long").as("sizeBytes")).as("meta")))
        .where(col("modality") === "image")
        .select("near_pairs", "near_assets").as[(Long, Long)].head()
      assert(batch == ((3L, 3L)))
    } finally query.stop()
  }

  test("bucket cap bounds state; a capped bucket still rejects against its members") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Array[Byte], String)]
    val docs = input.toDS().toDF("asset_id", "ts", "payload", "modality")
    val query = StreamingPhashDedup.nearDupRejections(
      docs, modalityCol = "modality", bucketCap = 2)
      .writeStream.format("memory").queryName("phash_cap_out")
      .outputMode("append").start()
    try {
      val events = (1L to 4L).map(i => (i, ts(i), payloadFor(p), "image"))
      input.addData(events: _*)
      query.processAllAvailable()
      val rows = spark.sql("SELECT assetId, priorId FROM phash_cap_out")
        .as[(Long, Long)].collect().toSeq
      // ids 3 and 4 arrive over the cap: still rejected (witness = earliest
      // member), and state never grows past 2 — id 2 is the only other
      // admitted member, so every witness is id 1
      assert(rows.map(_._1).toSet == Set(2L, 3L, 4L))
      assert(rows.forall(_._2 == 1L))
    } finally query.stop()
  }
}
