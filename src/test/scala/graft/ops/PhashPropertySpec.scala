package graft.ops

import graft.expr.PHash
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** The perceptual-hash family (q122 report, q123 admission) against
  * plain-Scala brute-force references over RANDOM corpora. The DuckDB
  * oracles certify both on the fixed testdata, where the corpus is
  * hash-sparse and near-dups are rare; these sweeps draw payloads from a
  * SMALL pattern pool (via the segment-constant construction, so hashes
  * realize the patterns exactly) plus random-byte payloads, forcing dense
  * collisions, multi-asset buckets, cross-modality shadows, and duplicate
  * groups the fixed corpus never exhibits. Caps are left non-binding —
  * capped behavior is pinned deterministically in MultimodalSpec. */
class PhashPropertySpec extends Properties("phash") {
  private lazy val spark = SparkTestSession.get

  private val Patterns = Seq(
    0x5A5A5A5A5A5A5A5AL, 0x5A5A5A5A5A5A5A59L, 0x5A5A5A5A5A5A5A58L,
    0x0F0F0F0F0F0F0F0FL, 0x0F0F0F0F0F0F0F1FL, 0x00FF00FF00FF00FFL,
    0x123456789ABCDEF0L, 0x123456789ABCDEF1L)

  private def payloadFor(bits: Long): Array[Byte] = graft.TestRefs.payloadFor(bits)

  private val genAssets: Gen[Seq[(Long, Array[Byte], String)]] = for {
    n <- Gen.choose(1, 24)
    rows <- Gen.listOfN(n, for {
      payload <- Gen.frequency(
        5 -> Gen.oneOf(Patterns).map(payloadFor),
        2 -> Gen.choose(0, 300).flatMap(len =>
          Gen.listOfN(len, Gen.choose(0, 255)).map(_.map(_.toByte).toArray)),
        1 -> Gen.const(Array.emptyByteArray))
      m <- Gen.oneOf("image", "audio")
    } yield (payload, m))
  } yield rows.zipWithIndex.map { case ((p, m), i) => (i.toLong, p, m) }

  private def assetsDf(rows: Seq[(Long, Array[Byte], String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("asset_id", "payload", "m")
      .select(col("asset_id"), col("payload"),
        struct(col("m").as("modality"), lit("png").as("format"),
          lit(0).as("width"), lit(0).as("height"), lit(0L).as("durationMs"),
          length(col("payload")).cast("long").as("sizeBytes")).as("meta"))
  }

  private def bandsOf(h: Long): Seq[(Int, Long)] =
    (0 until 4).map(j => (j, (h >>> (64 - 16 * (j + 1))) & 0xFFFFL))

  /** Brute-force near relation: every same-modality id pair sharing a band
    * with Hamming <= 3 (no blocking shortcuts — O(n^2) on purpose). The
    * reference hashes through phash64Any like the operators do — on these
    * generated payloads (no image magic) it equals the byte kernel, but
    * the reference should not assume that. */
  private def refPairs(rows: Seq[(Long, Array[Byte], String)])
      : Set[(Long, Long, Boolean)] = {
    val hs = rows.map { case (id, p, m) => (id, m, Multimodal.phash64Any(p)) }
    (for {
      (ia, ma, ha) <- hs; (ib, mb, hb) <- hs
      if ia < ib && ma == mb
      if bandsOf(ha).toSet.intersect(bandsOf(hb).toSet).nonEmpty
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb) <= 3)).toSet
  }

  property("report matches the brute-force reference") =
    Prop.forAll(genAssets) { rows =>
      val s = spark
      import s.implicits._
      val got = Multimodal.phashNearDupReport(assetsDf(rows))
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      val pairs = refPairs(rows)
      val byId = rows.map { case (id, p, m) => id -> m }.toMap
      val want = rows.map(_._3).distinct.map { m =>
        val ids = rows.collect { case (id, _, `m`) => id }
        val hashes = rows.collect { case (_, p, `m`) => Multimodal.phash64Any(p) }.distinct
        val mp = pairs.filter(t => byId(t._1) == m)
        val near = mp.filter(_._3)
        m -> ((ids.size.toLong, hashes.size.toLong, mp.size.toLong,
          near.size.toLong,
          near.flatMap(t => Seq(t._1, t._2)).size.toLong))
      }.toMap
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("admission matches the brute-force reference") =
    Prop.forAll(genAssets, Gen.choose(0, 3)) { (rows, mod) =>
      // deterministic split: ids ≡ 0 (mod 3) and the chosen residue are batch
      val (batch, corpus) = rows.partition(r => r._1 % 3 == 0 || r._1 % 4 == mod)
      val admitted = Multimodal.phashAdmit(assetsDf(corpus), assetsDf(batch))
        .select("asset_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().toSet
      val hs = rows.map { case (id, p, m) => id -> ((m, Multimodal.phash64Any(p))) }.toMap
      val batchIds = batch.map(_._1).toSet
      val rejected = batchIds.filter { id =>
        val (m, h) = hs(id)
        val priors = corpus.map(_._1) ++ batch.map(_._1).filter(_ < id)
        priors.exists { pid =>
          val (pm, ph) = hs(pid)
          pm == m && pid != id &&
            bandsOf(h).toSet.intersect(bandsOf(ph).toSet).nonEmpty &&
            java.lang.Long.bitCount(h ^ ph) <= 3
        }
      }
      Prop(admitted == batchIds -- rejected) :|
        s"admitted=$admitted expected=${batchIds -- rejected}"
    }
}
