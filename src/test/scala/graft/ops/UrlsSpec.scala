package graft.ops

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def canon(us: String*): Seq[String] =
    us.toDF("url").select(Urls.canonicalize(col("url"))).as[String].collect().toSeq

  test("scheme+host lowercase, path case preserved") {
    assert(canon("HTTP://Host.Example.COM/A/Path") ==
      Seq("http://host.example.com/A/Path"))
  }

  test("default ports dropped, explicit ports kept") {
    assert(canon(
      "http://h.com:80/a", "https://h.com:443/a", "http://h.com:8080/a",
      "https://h.com:80/a", "http://h.com:80") == Seq(
      "http://h.com/a", "https://h.com/a", "http://h.com:8080/a",
      "https://h.com:80/a", "http://h.com"))
  }

  test("tracking params stripped, kept params in original order") {
    assert(canon(
      "http://h.com/p?utm_source=x&id=1&utm_campaign=y&b=2",
      "http://h.com/p?utm_medium=cpc",
      "http://h.com/p?id=1&fbclid=abc&z=3") == Seq(
      "http://h.com/p?id=1&b=2",
      "http://h.com/p",
      "http://h.com/p?id=1&z=3"))
  }

  test("one trailing path slash dropped, root form bare") {
    assert(canon(
      "http://h.com/a/b/", "http://h.com/", "http://h.com/a/b/?utm_source=x") ==
      Seq("http://h.com/a/b", "http://h.com", "http://h.com/a/b"))
  }

  test("already-canonical URL is unchanged") {
    val u = "https://h.com/a/b?id=1"
    assert(canon(u) == Seq(u))
  }

  test("host extraction lowercases and drops port") {
    val got = Seq("HTTP://Host.EX.com:8080/a?b=1")
      .toDF("url").select(Urls.host(col("url"))).as[String].collect().toSeq
    assert(got == Seq("host.ex.com"))
  }
}
