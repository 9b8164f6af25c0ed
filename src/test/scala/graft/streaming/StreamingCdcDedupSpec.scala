package graft.streaming

import graft.ops.TextOps
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Batch↔stream parity for content-defined chunk dedup, plus the property
  * the fixed-tile mirror fails by construction: a later re-post with an
  * inserted preamble re-synchronizes and dedups against the original's
  * chunk state. */
class StreamingCdcDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def mkText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ =>
      ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(3)))
      .mkString(" ")
  }

  test("streamed kept chunks equal the batch first-arrival decision for an " +
      "in-order stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = mkText(1, 100)
    val b = mkText(2, 100)
    val rows = Seq((0L, a), (1L, b), (2L, a)) // doc 2 repeats doc 0 verbatim
    val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
    val timed = rows.zipWithIndex.map { case ((id, tx), i) =>
      (id, tx, new java.sql.Timestamp(t0.getTime + i * 1000L)) }

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = StreamingCdcDedup.keptChunks(
        input.toDS().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("append").start()
    val streamed = try {
      input.addData(timed.take(2): _*)
      query.processAllAvailable()
      input.addData(timed.drop(2): _*) // the verbatim dup, a batch later
      query.processAllAvailable()
      spark.sql("SELECT doc_id, chunk_idx FROM cdc_out")
        .as[(Long, Long)].collect().toSet
    } finally query.stop()
    // batch first-arrival: min (doc_id, chunk_idx) per chunk digest
    val batch = TextOps.cdcChunks(
        timed.toDF("doc_id", "text", "ts"), "text", Seq("doc_id"))
      .groupBy("_h")
      .agg(org.apache.spark.sql.functions
        .min(org.apache.spark.sql.functions.struct("doc_id", "chunk_idx"))
        .as("k"))
      .select(col("k.doc_id"), col("k.chunk_idx"))
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch, s"stream/batch divergence")
    assert(!streamed.exists(_._1 == 2L), "the verbatim re-post must dedup away")
    spark.sharedState.cacheManager.clearCache()
  }

  test("a shifted re-post re-syncs against the original's state; the " +
      "fixed-tile mirror admits it wholesale") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = mkText(3, 120)
    val t0 = java.sql.Timestamp.valueOf("2025-08-11 00:00:00")
    val rows = Seq((0L, base, t0),
      (1L, "BREAKING edit " + base, new java.sql.Timestamp(t0.getTime + 1000)))

    def survivors(mirror: (org.apache.spark.sql.DataFrame) =>
        org.apache.spark.sql.DataFrame, name: String): Map[Long, Long] = {
      val input = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = mirror(input.toDS().toDF("doc_id", "text", "ts"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(rows: _*)
        q.processAllAvailable()
        spark.sql(s"SELECT doc_id FROM $name").as[Long]
          .collect().groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      } finally q.stop()
    }
    val cdc = survivors(df => StreamingCdcDedup.keptChunks(df), "cdc_shift")
    val tile = survivors(df => StreamingChunkDedup.keptChunks(df), "tile_shift")
    // CDC: the shifted re-post contributes only its leading chunk(s)
    assert(cdc(1L) <= 2L,
      s"CDC must dedup the shifted re-post's tail: ${cdc(1L)} chunks kept")
    // fixed tiles: every tile shifted -> the re-post survives wholesale
    assert(tile(1L) >= tile(0L),
      s"fixture self-check: tiles must admit the shifted re-post ($tile)")
    spark.sharedState.cacheManager.clearCache()
  }
}
