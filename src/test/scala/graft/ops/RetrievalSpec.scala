package graft.ops

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("bm25 matches the hand-computed formula on a fixture") {
    val docs = Seq(
      (1L, "spark spark shuffle join"),   // tf(spark)=2, len 4
      (2L, "spark only once here in a longer document text"), // tf=1, len 9
      (3L, "no match at all in this one") // len 7
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, "text", "doc_id", Seq("spark"))
      .as[(String, Long, Long, Double)].collect()
      .map { case (t, id, tf, s) => (t, id, tf) -> s }.toMap

    val n = 3.0
    val dfreq = 2.0
    val avg = (4 + 9 + 7) / 3.0
    // StrictMath, not math.log: Spark's Log expression evaluates via
    // StrictMath (fdlibm), which can differ from Math.log by 1 ulp
    val idf = StrictMath.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
    def score(tf: Double, len: Double) = // (1.2 + 1.0), NOT literal 2.2: they differ by 1 ulp
      idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avg))
    assert(got.keySet == Set(("spark", 1L, 2L), ("spark", 2L, 1L)))
    assert(got(("spark", 1L, 2L)) == score(2, 4))
    assert(got(("spark", 2L, 1L)) == score(1, 9))
  }

  test("bm25: higher tf wins at equal length; rarer terms score higher") {
    val docs = Seq(
      (1L, "alpha alpha beta gamma"),
      (2L, "alpha beta beta gamma"),
      (3L, "delta epsilon zeta eta")
    ).toDF("doc_id", "text")
    val s = Retrieval.bm25(docs, "text", "doc_id", Seq("alpha", "beta", "gamma"))
      .as[(String, Long, Long, Double)].collect()
      .map { case (t, id, _, sc) => (t, id) -> sc }.toMap
    assert(s(("alpha", 1L)) > s(("alpha", 2L))) // tf 2 beats tf 1
    // gamma (df=2) and alpha (df=2) symmetric; all beat nothing — and a
    // term with df=2 outscores per-doc a hypothetical df=3 one: check via
    // direct idf monotonicity instead (df enters only through idf)
    assert(s(("beta", 2L)) > s(("beta", 1L)))
  }

  // --- q114: positional phrase search --------------------------------------

  /** q114's phrase is "slow hash batch"; these docs pin adjacency and order
    * semantics the bag-of-words leg cannot express. */
  test("q114 phrase search: adjacency and order are required, overlaps count") {
    val dir = java.nio.file.Files.createTempDirectory("phrase-docs").toString
    Seq(
      // two exact occurrences (positions 1 and 5, 1-based)
      (0L, "slow hash batch x slow hash batch"),
      // all terms present but never adjacent -> no match
      (1L, "slow x hash y batch"),
      // reversed order -> no match
      (2L, "batch hash slow"),
      // one occurrence mid-doc (position 2)
      (3L, "x slow hash batch y"),
      // prefix only -> no match
      (4L, "slow hash x batch"))
      .map { case (id, t) => (id, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.PipelineQueries.phraseSearch(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    // ordered by matches desc then doc_id; first_pos is 1-based
    assert(got == Seq((0L, 2L, 1L), (3L, 1L, 2L)))
    spark.sharedState.cacheManager.clearCache()
  }

  // --- q115: hybrid RRF fusion ---------------------------------------------

  /** One query term ("spark", from the shared bm25 term set) over a corpus
    * where doc 3 never contains the term but sits exactly on the lexical
    * top-docs' mean embedding — the semantic-only discovery hybrid fusion
    * exists to surface. All ranks are hand-derived. */
  test("q115 hybrid RRF: semantic leg surfaces a term-free doc; rrf exact") {
    val dir = java.nio.file.Files.createTempDirectory("rrf-docs").toString
    Seq(
      (1L, "spark spark x"), // lex rank 1 (tf 2)
      (2L, "spark y z"),     // lex rank 2
      (3L, "nothing here"),  // no term; embedding == centroid direction
      (4L, "other words"))   // no term, orthogonal-ish embedding
      .map { case (id, t) => (id, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.95f, 0.05f), 0), // == mean(e1, e2): cosine 1 vs centroid
      (4L, Array(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.PipelineQueries.hybridRrf(spark, dir)
      .as[(String, Long, Long, Long, Double, Int)].collect().toSeq
    def f(r: Long): Double = if (r == 0) 0.0 else 1.0 / (60.0 + r)
    def rnd6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // sem ranks vs centroid [0.95, 0.05]: d3 (cos 1) > d1 (0.998617)
    // > d2 (0.998314) > d4
    val expect = Seq(
      ("spark", 1L, 1L, 2L, rnd6(f(1) + f(2)), 1), // both legs -> fused top
      ("spark", 2L, 2L, 3L, rnd6(f(2) + f(3)), 2),
      ("spark", 3L, 0L, 1L, rnd6(f(1)), 3),        // semantic-only discovery
      ("spark", 4L, 0L, 4L, rnd6(f(4)), 4))
    assert(got == expect)
    // arithmetic self-consistency on every row: rrf recomputes from ranks
    got.foreach { case (_, _, lr, sr, rrf, _) => assert(rrf == rnd6(f(lr) + f(sr))) }
    spark.sharedState.cacheManager.clearCache()
  }

  test("q114 phrase search: empty corpus yields an empty, well-typed result") {
    val dir = java.nio.file.Files.createTempDirectory("phrase-empty").toString
    Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.PipelineQueries.phraseSearch(spark, dir)
    assert(got.columns.toSeq == Seq("doc_id", "n_matches", "first_pos"))
    assert(got.count() == 0)
    spark.sharedState.cacheManager.clearCache()
  }
}
