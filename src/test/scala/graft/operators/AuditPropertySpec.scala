package graft.operators

import graft.pipeline.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties}

/** The round-10 text operators against plain-Scala brute-force references
  * over RANDOM corpora — the DuckDB oracles certify them on the fixed
  * testdata; these sweep the input space (runt docs, empty docs, vocab
  * bigger and smaller than the cutoff, repeated chunks within and across
  * docs). */
class AuditPropertySpec extends Properties("audit") {
  private lazy val spark = SparkTestSession.get

  private val ChunkW = 20
  private val VocabK = 64

  // token universe of 80 distinct tokens (> the 64-token vocab cutoff) with
  // multi-char tokens so char pairs exist; docs 0-45 tokens incl. empty
  private val genCorpus: Gen[Seq[(Long, String, String)]] = for {
    n <- Gen.choose(1, 22)
    rows <- Gen.listOfN(n, for {
      len <- Gen.frequency(1 -> Gen.const(0), 8 -> Gen.choose(1, 45))
      toks <- Gen.listOfN(len, Gen.choose(0, 79).map(i => f"tk$i%02d"))
      src <- Gen.oneOf("s0", "s1", "s2")
    } yield (toks, src))
  } yield rows.zipWithIndex.map { case ((toks, src), i) =>
    (i.toLong, toks.mkString(" "), src)
  }

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audit-prop").toString
    rows.map { case (id, t, src) => (id, t, "en", src) }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(t: String): Seq[String] =
    t.split("\\s+").filter(_.nonEmpty).toSeq

  // Spark's round() (and DuckDB's) is HALF_UP on the shortest decimal
  // representation — math.rint would be HALF_EVEN and diverges on exact
  // dyadic halves like 9/128 = 0.0703125 (caught by this very suite)
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  property("chunkDedup matches the keep-first tile reference") =
    Prop.forAll(genCorpus) { rows =>
      val s = spark
      import s.implicits._
      val got = CurationQueries.chunkDedup(spark, docsDf(rows))
        .as[(Long, String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
      // reference: tile each doc into W-token chunks, keep-first by
      // (doc_id, chunk_idx) per chunk content
      val chunks = rows.flatMap { case (id, t, src) =>
        toks(t).grouped(ChunkW).zipWithIndex.map { case (c, ci) =>
          (id, src, ci, c.mkString(" "))
        }
      }
      val firstOf = chunks.groupBy(_._4).map { case (c, occ) =>
        c -> occ.map(o => (o._1, o._3.toLong)).min
      }
      val expect = chunks.groupBy(c => (c._1, c._2)).toSeq.map { case ((id, src), cs) =>
        val kept = cs.count(c => firstOf(c._4) == ((c._1, c._3.toLong)))
        (id, src, cs.size.toLong, kept.toLong, r6(kept.toDouble / cs.size))
      }.sortBy(_._1)
      got == expect
    }

  property("bpePairs matches the frequency-weighted char-pair reference") =
    Prop.forAll(genCorpus) { rows =>
      val s = spark
      import s.implicits._
      val got = PipelineQueries.bpePairs(spark, docsDf(rows))
        .as[(String, Long)].collect().toSeq
      val tf = rows.flatMap(r => toks(r._2)).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
      val pairs = tf.toSeq.filter(_._1.length >= 2).flatMap { case (w, c) =>
        w.sliding(2).map(_ -> c)
      }.groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
      val expect = pairs.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
      got == expect
    }

  property("oovRate + tokenIds agree with the shared top-64 vocab reference") =
    Prop.forAll(genCorpus) { rows =>
      val s = spark
      import s.implicits._
      val dir = docsDf(rows)
      val all = rows.flatMap(r => toks(r._2))
      val tf = all.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
      val vocabSeq = tf.toSeq.sortBy { case (w, c) => (-c, w) }.take(VocabK).map(_._1)
      val vocabId = vocabSeq.zipWithIndex.map { case (w, i) => w -> (i + 1L) }.toMap

      val gotOov = PipelineQueries.oovRate(spark, dir)
        .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
      val expOov = rows.flatMap(r => toks(r._2).map(w => (r._3, w)))
        .groupBy(_._1).toSeq.map { case (src, ws) =>
          val oov = ws.count(w => !vocabId.contains(w._2)).toLong
          (src, ws.size.toLong, oov, r6(oov.toDouble / ws.size))
        }.sortBy(_._1)

      val gotIds = PipelineQueries.tokenIds(spark, dir)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val expIds = rows.filter(r => toks(r._2).nonEmpty).map { case (id, t, _) =>
        val ts = toks(t)
        val ck = ts.zipWithIndex.map { case (w, i) =>
          (i + 1L) * vocabId.getOrElse(w, 0L)
        }.sum
        (id, ts.size.toLong, ck)
      }.sortBy(_._1)
      gotOov == expOov && gotIds == expIds
    }
}
