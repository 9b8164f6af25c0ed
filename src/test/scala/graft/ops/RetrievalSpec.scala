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
