package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixtures for the round-10 data-selection operators: semantic dedup
  * (deterministic k-means + within-cluster prune), PII scrubbing, the
  * hashed linear gate, and the two-pass global sequence index. The
  * corpus-level behavior of their queries (q91-q95) is oracle-checked by
  * the driver; these pin the hand-computable rules.
  */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  // --- SemDedup ------------------------------------------------------------

  /** Two obvious direction clusters on the 2D axes, ids chosen so ids 0 and
    * 2 are the init centroids (initEvery=2, initMax=4). */
  private def axisDf = Seq(
    (0L, Array(1.0f, 0.0f)),   // +x (init centroid 0)
    (1L, Array(4.0f, 0.1f)),   // +x
    (2L, Array(0.0f, 1.0f)),   // +y (init centroid 1)
    (3L, Array(-0.1f, 2.0f)),  // +y
    (5L, Array(2.0f, 0.0f))    // +x, exact duplicate direction of id 0
  ).toDF("vec_id", "embedding")

  test("kmeansFit converges to the axis clusters with original labels") {
    val cents = SemDedup.kmeansFit(axisDf, "embedding", "vec_id",
      initEvery = 2, initMax = 4, iters = 2)
    assert(cents.map(_._1) == Seq(0, 1))
    val Seq((_, c0), (_, c1)) = cents
    // cluster 0 = mean of the +x members, cluster 1 = mean of the +y members
    assert(c0(0) > 1.0 && math.abs(c0(1)) < 0.1)
    assert(c1(1) > 1.0 && math.abs(c1(0)) < 0.1)
  }

  test("assignLabeled breaks cosine ties toward the higher label") {
    val df = Seq((0L, Array(1.0f, 1.0f))).toDF("id", "v")
    // two identical centroids: the (sim, label) struct max must pick label 7
    val cents = Seq(3 -> Array(1.0, 0.0), 7 -> Array(1.0, 0.0))
    val got = df.select(SemDedup.assignLabeled(col("v"), cents)).head.getInt(0)
    assert(got == 7)
  }

  test("assignAndPrune keeps the earliest member of a near-dup pair") {
    val cents = SemDedup.kmeansFit(axisDf, "embedding", "vec_id",
      initEvery = 2, initMax = 4, iters = 2)
    val got = SemDedup.assignAndPrune(axisDf, "embedding", "vec_id", cents,
      threshold = 0.95).as[(Long, Int, Boolean)].collect()
      .map { case (id, _, pruned) => id -> pruned }.toMap
    // ids 0/1/5 are mutually near-parallel: 0 survives (earliest), 1 and 5 prune
    assert(!got(0L) && got(1L) && got(5L))
    // the +y pair at cosine ~0.97: 2 survives, 3 prunes
    assert(!got(2L) && got(3L))
  }

  test("saveModel/loadModel round-trips the fitted centroids exactly") {
    val cents = SemDedup.kmeansFit(axisDf, "embedding", "vec_id",
      initEvery = 2, initMax = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("semmodel").toString + "/model"
    SemDedup.saveModel(spark, cents, dir)
    val loaded = SemDedup.loadModel(spark, dir)
    assert(loaded.map(_._1) == cents.map(_._1))
    assert(loaded.map(_._2.toSeq) == cents.map(_._2.toSeq))
    // a loaded model drives the same assignments as the fitted one
    val a = SemDedup.assignAndPrune(axisDf, "embedding", "vec_id", cents, 0.95)
      .as[(Long, Int, Boolean)].collect().toSet
    val b = SemDedup.assignAndPrune(axisDf, "embedding", "vec_id", loaded, 0.95)
      .as[(Long, Int, Boolean)].collect().toSet
    assert(a == b)
  }

  test("assignAndPrune rep cap bounds the comparison set deterministically") {
    // one cluster of 6 near-identical vectors; repCap=2 means members only
    // compare against the two earliest ids — still enough to prune all but
    // the earliest, and the decision is id-deterministic
    val df = (0 until 6).map(i => (i.toLong, Array(1.0f, i * 1e-4f)))
      .toDF("vec_id", "embedding")
    val cents = Seq(0 -> Array(1.0, 0.0))
    val got = SemDedup.assignAndPrune(df, "embedding", "vec_id", cents,
      threshold = 0.99, repCap = 2)
      .as[(Long, Int, Boolean)].collect()
    assert(got.count(_._3) == 5 && !got.find(_._1 == 0L).get._3)
  }

  // --- Scrub ---------------------------------------------------------------

  test("scrub masks email, then IPv4, then digit runs, without double count") {
    val df = Seq("mail a1234@ex.com from 10.0.0.1 order 98765 x 7").toDF("s")
    val r = df.select(Scrub.scrub(col("s")).as("r")).select("r.*")
      .as[(Int, Int, Int, String)].head()
    // the 1234 inside the email and the digits inside the IP must NOT count
    // as digit runs; the lone '7' is below the 2-digit floor
    assert(r == ((1, 1, 1, "mail <EMAIL> from <IP> order <NUM> x 7")))
  }

  test("scrub of a clean string is the identity with zero counts") {
    val r = Seq("no pii here").toDF("s")
      .select(Scrub.scrub(col("s")).as("r")).select("r.*")
      .as[(Int, Int, Int, String)].head()
    assert(r == ((0, 0, 0, "no pii here")))
  }

  test("tokenWeight is the documented hash arithmetic, in [-48, 48]") {
    val ws = Seq("the", "spark", "row", "a", "zz").toDF("w")
      .select(Scrub.tokenWeight(col("w")).as("wt")).as[Long].collect()
    assert(ws.forall(w => w >= -48 && w <= 48))
    // pin one value against the independently-computed definition
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("spark".getBytes("UTF-8")).take(8)
    val h60 = java.lang.Long.parseLong(
      h.map(b => f"$b%02x").mkString.take(15), 16)
    val expected = (h60 % 1024) % 97 - 48
    assert(ws(1) == expected)
  }

  // --- q97 boilerplate -----------------------------------------------------

  test("boilerplate flags gram starts repeated in more than BoilerDf docs") {
    import graft.operators.SelectionQueries
    val dir = java.nio.file.Files.createTempDirectory("boiler").toString
    // "a b c" appears in 4 docs (> 3: boilerplate); "x y z" in 3 (not).
    // doc texts are 5 tokens -> 3 gram starts each
    val docs = Seq(
      (0L, "a b c p q", "en", "s0"), (1L, "a b c r s", "en", "s0"),
      (2L, "a b c t u", "en", "s1"), (3L, "a b c v w", "en", "s1"),
      (4L, "x y z m n", "en", "s1"), (5L, "x y z o k", "en", "s1"),
      (6L, "x y z g h", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SelectionQueries.boilerplate(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // s0: 2 docs x 3 starts, 1 flagged start each ("a b c")
    // s1: 5 docs x 3 starts, 2 flagged ("a b c" in docs 2,3), x-y-z df=3 unflagged
    assert(got == Seq(
      ("s0", 2L, 6L, 2L, 0.333333),
      ("s1", 5L, 15L, 2L, 0.133333)))
  }

  // --- q99 pipeline funnel -------------------------------------------------

  /** The classifier weight, recomputed independently (java MD5, not the
    * operator's Catalyst expression). */
  private def tokWeight(t: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 1024) % 97 - 48
  }

  private def bucket16(s: String): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(("mix" + s).getBytes("UTF-8")).take(2).map(b => f"$b%02x").mkString
    java.lang.Integer.parseInt(hex, 16)
  }

  test("pipeline funnel: planted PII, gate-fail, exact-dup and near-dup docs " +
    "drop at exactly their stages") {
    import graft.operators.SelectionQueries
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    // letter-only tokens (no digit runs, so the scrub leaves them alone),
    // selected by their independently-computed weights so the gate outcome
    // is planted, not accidental
    val all2 = for { a <- 'a' to 'z'; b <- 'a' to 'z' } yield s"$a$b"
    val base = all2.map("t" + _).filter(tokWeight(_) > 5).take(30)
    val alt = all2.map("u" + _).filter(tokWeight(_) < -5).take(30)
    val near = base.dropRight(1) :+ "yzz"
    val piiMasked = Seq("account", "<NUM>", base(0), base(1))
    require(base.map(tokWeight).sum > 0 && near.map(tokWeight).sum > 0 &&
      alt.map(tokWeight).sum < 0 && piiMasked.map(tokWeight).sum > 0)
    val docs = Seq(
      (0L, base.mkString(" "), "en", "s0"),
      (1L, base.mkString(" "), "en", "s0"),                    // exact dup of 0
      (2L, near.mkString(" "), "en", "s0"),                    // near dup of 0
      (3L, s"account 123456 ${base(0)} ${base(1)}", "en", "s0"), // PII; masked form passes the gate
      (4L, alt.mkString(" "), "en", "s0"))                     // gate drop
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SelectionQueries.pipelineFunnel(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    // sampling: single source -> rate = F = 0.5 -> 16-bit threshold 32768,
    // decided on the MASKED text; recomputed here independently
    val survivors = Seq(base.mkString(" ") -> 30L,
      s"account <NUM> ${base(0)} ${base(1)}" -> 4L)
    val s5 = survivors.filter { case (t, _) => bucket16(t) < 32768 }
    assert(got == Seq(
      ("0_ingest", 5L, 124L),
      ("1_scrub", 5L, 124L),       // masking preserves these token counts
      ("2_quality", 4L, 94L),      // doc 4's negative score drops it
      ("3_exact_dedup", 3L, 64L),  // doc 1 drops, doc 0 kept (min id)
      ("4_near_dedup", 2L, 34L),   // doc 2 drops against doc 0
      ("5_sampled", s5.size.toLong, s5.map(_._2).sum)))
  }

  // --- re-run determinism --------------------------------------------------

  test("selection queries are re-run deterministic (the dataset-version contract)") {
    import graft.operators.SelectionQueries
    // a re-run of the same pipeline on the same corpus must reproduce every
    // row — content-hash decisions, the two-pass global sequence (whose
    // range boundaries may differ between runs), and the k-means fit alike
    val dir = "/root/testdata/sf0.001"
    def snap(name: String) = {
      val df = SelectionQueries.all.toMap.apply(name)(spark, dir)
      val rows = df.collect().map(_.toString).sorted.toSeq
      spark.sharedState.cacheManager.clearCache()
      rows
    }
    for (q <- Seq("q91_semantic_dedup", "q92_mixture_sample", "q94_epoch_order"))
      assert(snap(q) == snap(q), s"$q must be identical across runs")
  }

  // --- Layout.globalSequence -----------------------------------------------

  test("globalSequence equals the single-partition ROW_NUMBER exactly") {
    val df = (0 until 500).map { i =>
      (i.toLong, (i * 2654435761L) % 1000) // colliding keys: tiebreaker matters
    }.toDF("id", "k").repartition(7)
    val got = Layout.globalSequence(df, Seq(col("k"), col("id")), "pos", partitions = 5)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    val want = df.select(col("id"), row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("id")))
      .cast("long").as("pos")).as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("globalSequence survives more partitions than rows") {
    val df = Seq((1L, 10L), (2L, 5L)).toDF("id", "k")
    val got = Layout.globalSequence(df, Seq(col("k"), col("id")), "pos", partitions = 8)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 1L, 1L -> 2L))
  }

  // --- TrainedGate (q103 kernel) -------------------------------------------

  test("fitLogistic first step matches the closed-form gradient") {
    // w=0 ⇒ σ=0.5 for every row ⇒ grad_k = avg((y − 0.5)·x_k)
    val f = Seq((1.0, 1.0, 2.0), (0.0, 1.0, -4.0)).toDF("y", "x_b", "x_t")
    val w = TrainedGate.fitLogistic(f, Seq("x_b", "x_t"), "y", lr = 0.5, iters = 1)
    // grad_b = ((0.5·1) + (−0.5·1))/2 = 0; grad_t = ((0.5·2) + (−0.5·−4))/2 = 1.5
    assert(w == Seq(0.0, 0.75))
  }

  test("fitLogistic separates a separable set and is re-run deterministic") {
    val rows = (0 until 200).map { i =>
      val x = (i % 21 - 10) / 10.0 // -1.0 .. 1.0
      (if (x >= 0.15) 1.0 else 0.0, 1.0, x)
    }
    val f = rows.toDF("y", "x_b", "x_t").repartition(7)
    val w1 = TrainedGate.fitLogistic(f, Seq("x_b", "x_t"), "y", lr = 1.0, iters = 30)
    val w2 = TrainedGate.fitLogistic(f.repartition(3), Seq("x_b", "x_t"), "y", lr = 1.0, iters = 30)
    // bit-identical across partitionings: the 6-dp gradient rounding
    // absorbs partial-sum order, so the trajectories coincide exactly
    assert(w1 == w2)
    val acc = f.select((TrainedGate.margin(w1, Seq(col("x_b"), col("x_t"))) >= 0)
        .cast("double").as("keep"), col("y"))
      .where(col("keep") === col("y")).count().toDouble / rows.size
    assert(acc >= 0.95, s"accuracy $acc with w=$w1")
  }

  test("fitLogistic on an empty frame keeps the zero vector") {
    val f = Seq.empty[(Double, Double)].toDF("y", "x_b")
    assert(TrainedGate.fitLogistic(f, Seq("x_b"), "y", 0.5, 4) == Seq(0.0))
  }

  // --- q119: cluster-balanced coreset --------------------------------------

  test("q119 coreset keeps ceil(sqrt(n)) per cluster by the content-hash order") {
    val dir = java.nio.file.Files.createTempDirectory("coreset-emb").toString
    // init centroids are the id-RANK 1 and 51 vectors (initEvery=50 by
    // rank — the distribution-free rule): ids 0..49 are a tight +x family
    // (rank 1 = id 0 seeds +x), id 50 at rank 51 seeds +y. Cluster 0 keeps
    // ceil(sqrt(50)) = 8, cluster 1 keeps its 1.
    val xs = (0L until 50L).map(i =>
      (i, Array(1.0f, Seq(0.0f, 0.02f, 0.05f, 0.1f)((i % 4).toInt)), 0))
    (xs :+ ((50L, Array(0.0f, 1.0f), 0)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.SelectionQueries.coresetSample(spark, dir)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    // which eight +x ids survive: first eight under (h60('cs:'+id), id)
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.ByteBuffer.wrap(md, 0, 8).getLong >>> 4
    }
    val kept = (0L until 50L).sortBy(id => (h60(s"cs:$id"), id)).take(8)
    assert(got == Seq(
      (0, 50L, 8L, kept.sum, kept.min),
      (1, 1L, 1L, 50L, 50L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q155 cluster quality: tight planted clusters score high cohesion and positive margin") {
    val dir = java.nio.file.Files.createTempDirectory("quality-emb").toString
    // same init geometry as the q119 fixture (rank-1 and rank-51 seeds):
    // cluster 0 = fifty tight +x vectors, cluster 1 = two +y vectors —
    // tight and orthogonal, so every member separates and margins are wide.
    val xs = (0L until 50L).map(i =>
      (i, Array(1.0f, Seq(0.0f, 0.02f, 0.05f, 0.1f)((i % 4).toInt)), 0))
    (xs ++ Seq((50L, Array(0.0f, 1.0f), 0), (51L, Array(0.05f, 1.0f), 0)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.SelectionQueries.clusterQuality(spark, dir)
      .as[(Int, Long, Double, Double, Double, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._6)) == Seq((0, 50L, 50L), (1, 2L, 2L)),
      s"membership/separation: $got")
    for (r <- got) {
      assert(r._3 > 0.99, s"cohesion should be near 1 for a tight cluster: $r")
      assert(r._4 < 0.2, s"nearest-other should be near orthogonal: $r")
      assert(r._5 > 0.8, s"margin should be wide: $r")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  // --- q113: importance-weighted selection (DSIR) --------------------------

  /** Plain-Scala replay of the q113 pipeline (h60-mod-128 buckets, add-one
    * smoothing, 9-dp log ratios, 6-dp doc sums) — the reference the Spark
    * result must match bit-for-bit. */
  private def dsirReference(docs: Seq[(Long, String, String, String)])
      : Seq[(String, Long, Long, Long, Double, Double)] = {
    val B = 128
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.ByteBuffer.wrap(md, 0, 8).getLong >>> 4
    }
    def rnd(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = docs.flatMap { case (id, text, lang, source) =>
      text.split("\\s+").filter(_.nonEmpty).map { w =>
        (id, source, (h60(w) % B).toInt, if (lang == "en") 1L else 0L)
      }
    }
    val cnt = toks.groupBy(_._3).view.mapValues(xs =>
      (xs.size.toLong, xs.map(_._4).sum)).toMap
    val tr = cnt.values.map(_._1).sum
    val tt = cnt.values.map(_._2).sum
    val r = cnt.map { case (b, (cr, ct)) =>
      b -> rnd(math.log(((ct + 1).toDouble / (tt + B)) /
        ((cr + 1).toDouble / (tr + B))), 9)
    }
    val perDoc = toks.groupBy(t => (t._1, t._2)).view.mapValues { xs =>
      (xs.size.toLong, rnd(xs.map(t => r(t._3)).sum, 6))
    }.toSeq
    perDoc.groupBy(_._1._2).map { case (source, ds) =>
      val ws = ds.map(_._2._2)
      (source, ds.size.toLong, ws.count(_ > 0).toLong, ds.map(_._2._1).sum,
        rnd(ws.sum / ds.size, 6), rnd(ws.max, 6))
    }.toSeq.sortBy(_._1)
  }

  test("q113 importance weights match the plain-Scala DSIR replay") {
    val dir = java.nio.file.Files.createTempDirectory("dsir-docs").toString
    // target = en; srcA is target-heavy, srcB raw-only; one token-less doc
    // (must vanish from the rollup — explode drops it, as unnest does)
    val docs = Seq(
      (0L, "alpha beta alpha gamma", "en", "srcA"),
      (1L, "alpha alpha beta beta", "en", "srcA"),
      (2L, "delta epsilon zeta", "de", "srcB"),
      (3L, "alpha delta delta", "de", "srcB"),
      (4L, "   ", "en", "srcB"),
      (5L, "beta gamma gamma gamma alpha", "en", "srcB"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.SelectionQueries.importanceWeights(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == dsirReference(docs))
    // and the intended behavior: the target-heavy source scores higher
    val bySrc = got.map(t => t._1 -> t._5).toMap
    assert(bySrc("srcA") > bySrc("srcB"))
    spark.sharedState.cacheManager.clearCache()
  }

  test("q113 is re-run deterministic and scores en-token docs above de-only") {
    val dir = java.nio.file.Files.createTempDirectory("dsir-docs2").toString
    // larger mixed corpus: en docs draw from {good*}, de docs from {bad*}
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0)
        (i, s"good${i % 5} good${(i + 1) % 5} common", "en", "srcT")
      else
        (i, s"bad${i % 7} bad${(i + 2) % 7} common", "de", "srcR")
    }
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = graft.operators.SelectionQueries.importanceWeights(spark, dir)
    val a = q.as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    spark.sharedState.cacheManager.clearCache()
    val b = q.as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    spark.sharedState.cacheManager.clearCache()
    assert(a == b)
    assert(a == dsirReference(docs))
    val bySrc = a.map(t => t._1 -> t._5).toMap
    // every srcT doc is en-heavy -> its mean log-weight must exceed srcR's
    assert(bySrc("srcT") > bySrc("srcR"))
  }
}
