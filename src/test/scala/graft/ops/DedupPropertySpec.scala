package graft.ops

import graft.pipeline.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties}

/** Invariants of the hot-bucket candidate capping (Dedup.cappedPairs) over
  * random blocking relations — the skew guard must never invent pairs, must
  * be exhaustive below the cap, and must keep every hot-bucket member
  * reachable through its representative. */
class DedupPropertySpec extends Properties("cappedPairs") {
  private lazy val spark = SparkTestSession.get

  // random (_id, _b) blocking relation: ids 0..n-1, each assigned 1-3 of a
  // handful of bucket keys (small key space forces hot buckets)
  private val genBlocked: Gen[Seq[(Long, Int)]] = for {
    n <- Gen.choose(1, 60)
    keys <- Gen.listOfN(n, Gen.choose(0, 4))
    extra <- Gen.listOfN(n, Gen.option(Gen.choose(0, 4)))
  } yield (0L until n.toLong).zip(keys).map { case (id, k) => (id, k) } ++
    (0L until n.toLong).zip(extra).collect { case (id, Some(k)) => (id, k) }

  private def run(rows: Seq[(Long, Int)], maxBucket: Int): Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val blocked = rows.toDF("_id", "_k")
      .select(col("_id"), struct(col("_k")).as("_b")).distinct()
    Dedup.cappedPairs(blocked, maxBucket)
      .as[(Long, Long)].collect().toSet
  }

  private def sameBucketPairs(rows: Seq[(Long, Int)]): Set[(Long, Long)] = {
    val byKey = rows.distinct.groupBy(_._2).values
    byKey.flatMap { members =>
      val ids = members.map(_._1).distinct
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
  }

  property("pairs are ordered and never cross buckets") = Prop.forAll(genBlocked) { rows =>
    val got = run(rows, maxBucket = 8)
    val legal = sameBucketPairs(rows)
    got.forall { case (a, b) => a < b && legal((a, b)) }
  }

  property("uncapped output is exactly the same-bucket pairs") = Prop.forAll(genBlocked) { rows =>
    run(rows, maxBucket = Int.MaxValue) == sameBucketPairs(rows)
  }

  property("every hot-bucket member pairs with its representative") =
    Prop.forAll(genBlocked) { rows =>
      val cap = 4
      val got = run(rows, cap)
      rows.distinct.groupBy(_._2).values.forall { members =>
        val ids = members.map(_._1).distinct.sorted
        ids.size <= cap || {
          val rep = ids.head
          ids.tail.forall(id => got((rep, id)))
        }
      }
    }
}
