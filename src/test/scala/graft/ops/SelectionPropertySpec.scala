package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** The round-10 selection operators against brute-force references over
  * random data: the semantic prune rule and the two-pass global sequence
  * index. */
class SelectionPropertySpec extends Properties("selection") {
  private lazy val spark = SparkTestSession.get

  private def cosRef(a: Array[Double], b: Array[Double]): Double = {
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < a.length) { dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1 }
    val d = math.sqrt(daa) * math.sqrt(dbb)
    if (d == 0.0) 0.0 else dab / d
  }

  // small 2-d vector space with a few repeated directions forces near-dups
  private val genVecs: Gen[Seq[(Long, Array[Float])]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      dir <- Gen.oneOf(0.0, 0.5, 1.0, 2.0, 3.5) // radians-ish
      scale <- Gen.choose(1, 4)
    } yield Array((scale * math.cos(dir)).toFloat, (scale * math.sin(dir)).toFloat))
  } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  property("assignAndPrune matches the greedy by-id reference") =
    Prop.forAll(genVecs, Gen.choose(1, 4)) { (rows, repCap) =>
      val s = spark
      import s.implicits._
      val df = rows.toDF("vec_id", "embedding")
      val cents = Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0), 2 -> Array(-1.0, 0.0))
      val tau = 0.95
      val got = SemDedup.assignAndPrune(df, "embedding", "vec_id", cents, tau, repCap)
        .as[(Long, Int, Boolean)].collect().sortBy(_._1).toSeq

      // reference: assign by argmax cosine (ties -> higher label), then
      // prune X iff an earlier-id member of the SAME cluster, among the
      // cluster's first `repCap` ids, has cosine >= tau with X
      val vecs = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
      val assign = vecs.map { case (id, v) =>
        id -> cents.map { case (ci, cv) => (cosRef(v, cv), ci) }.max._2
      }
      val expect = rows.map(_._1).sorted.map { id =>
        val ci = assign(id)
        val reps = rows.map(_._1).filter(assign(_) == ci).sorted.take(repCap)
        val pruned = reps.exists(rid => rid < id && cosRef(vecs(rid), vecs(id)) >= tau)
        (id, ci, pruned)
      }
      got == expect
    }

  private val genPiiText: Gen[String] = for {
    n <- Gen.choose(0, 12)
    parts <- Gen.listOfN(n, Gen.oneOf(
      Gen.oneOf("plain", "words", "here", "x"),
      Gen.choose(0, 999999999).map(_.toString),
      for { u <- Gen.oneOf("bob", "a.b", "x_1"); d <- Gen.oneOf("ex.com", "a.co.uk") } yield s"$u@$d",
      for { a <- Gen.choose(0, 255); b <- Gen.choose(0, 255) } yield s"10.0.$a.$b"))
  } yield parts.mkString(" ")

  property("scrubbed text re-scans clean and masking is idempotent") =
    Prop.forAll(Gen.listOf(genPiiText)) { texts =>
      val s = spark
      import s.implicits._
      if (texts.isEmpty) Prop.passed
      else {
        val masked = texts.toDF("s")
          .select(Scrub.scrub(org.apache.spark.sql.functions.col("s")).getField("masked").as("m"))
          .as[String].collect().toSeq
        // a second scrub pass finds nothing and changes nothing
        val second = masked.toDF("m")
          .select(Scrub.scrub(org.apache.spark.sql.functions.col("m")).as("r")).select("r.*")
          .as[(Int, Int, Int, String)].collect().toSeq
        Prop(second.zip(masked).forall { case ((e, i, d, m2), m1) =>
          e == 0 && i == 0 && d == 0 && m2 == m1
        })
      }
    }

  property("globalSequence equals ROW_NUMBER over the total order") =
    Prop.forAll(
      Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 9L))),
      Gen.choose(1, 6)) { (keys, parts) =>
      val s = spark
      import s.implicits._
      val rows = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
      val got =
        if (rows.isEmpty) Map.empty[Long, Long]
        else Layout.globalSequence(rows.toDF("id", "k"),
          Seq(col("k"), col("id")), "pos", partitions = parts)
          .select("id", "pos").as[(Long, Long)].collect().toMap
      val expect = rows.sortBy { case (id, k) => (k, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      got == expect
    }

  property("quotaPerKeyAgg equals the window quota on unique order keys") =
    Prop.forAll(
      Gen.choose(1, 50).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 5))), // key per row, skew-prone
      Gen.choose(1, 6)) { (keyIdx, quota) =>
      val s = spark
      import s.implicits._
      // order key = row index: unique by construction (the documented
      // precondition); key distribution from the generator is often hot
      val rows = keyIdx.zipWithIndex.map { case (k, i) => (s"k$k", i.toLong) }
      val df = rows.toDF("key", "ord")
      def got(d: org.apache.spark.sql.DataFrame) =
        d.as[(String, Long)].collect().toSet
      got(Sampling.quotaPerKeyAgg(df, "key", "ord", quota)) ==
        got(Sampling.quotaPerKey(df, "key", "ord", quota))
    }
}
