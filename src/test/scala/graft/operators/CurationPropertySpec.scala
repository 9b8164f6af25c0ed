package graft.operators

import graft.pipeline.SparkTestSession
import graft.streaming.StreamingCuration
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** The two Gopher-rule implementations — the relational corpus path
  * (CurationQueries.gopherRules) and the array-side stateless path
  * (TextOps.gopherFlags, the streaming gate) — must agree on ARBITRARY
  * token streams, not just the hand-picked fixtures: random token counts,
  * lengths, stopword densities, and repetition levels, including docs
  * sitting exactly ON each integer rule boundary. */
class CurationPropertySpec extends Properties("gopherRules") {
  private lazy val spark = SparkTestSession.get

  // token generator biased toward rule boundaries: stopwords, single chars,
  // long words, and a repeated word to drive the max-token-fraction rule
  private val genToken: Gen[String] = Gen.frequency(
    3 -> Gen.oneOf("the", "a"),
    4 -> Gen.oneOf("hot", "word", "words", "table"),
    2 -> Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)),
    1 -> Gen.const("x"))

  private val genDoc: Gen[String] = for {
    n <- Gen.frequency(3 -> Gen.choose(1, 30), 4 -> Gen.choose(15, 95), 1 -> Gen.choose(85, 120))
    toks <- Gen.listOfN(n, genToken)
  } yield toks.mkString(" ")

  private val genCorpus: Gen[Seq[String]] =
    Gen.choose(1, 12).flatMap(k => Gen.listOfN(k, genDoc))

  property("relational rollup equals array-side flag rollup") =
    Prop.forAll(genCorpus) { docs =>
      val s = spark
      import s.implicits._
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t, if (i % 2 == 0) "en" else "fr", "s0") }
        .toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")))
      val dir = java.nio.file.Files.createTempDirectory("curation-prop").toString
      df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val relational = CurationQueries.gopherRules(spark, dir)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
      val arraySide = StreamingCuration.annotate(df)
        .where(col("n_tokens") > 0)
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("keep").cast("long")).as("n_keep"),
          sum(lit(1L) - col("wc_ok").cast("long")).as("v_wordcount"),
          sum(lit(1L) - col("mwl_ok").cast("long")).as("v_meanlen"),
          sum(lit(1L) - col("stop_ok").cast("long")).as("v_stopword"),
          sum(lit(1L) - col("rep_ok").cast("long")).as("v_repetition"))
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
      relational == arraySide
    }
}
