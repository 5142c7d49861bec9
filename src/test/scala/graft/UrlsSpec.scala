package graft

import graft.functions.Urls
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for [[Urls.canonicalize]] covering the branches q106's
  * synthesized corpus cannot reach (it only constructs https URLs with a
  * query): the http `:80` strip, the https-port-on-http non-strip, bare
  * paths with no query, multi-slash trailing runs, and idempotence.
  */
class UrlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq
  }

  test("scheme/host case, default ports, fragments, utm params, ordering") {
    assert(canon(
      "HTTPS://WWW.Ex.COM:443/a/b?b=2&a=1&utm_source=x#frag",
      "http://Host.Org:80/p?z=9&utm_campaign=c&y=8",
      "http://host.org:443/p", // 443 is NOT http's default port — kept
      "https://h.io:8443/p"    // non-default port — kept
    ) == Seq(
      "https://www.ex.com/a/b?a=1&b=2",
      "http://host.org/p?y=8&z=9",
      "http://host.org:443/p",
      "https://h.io:8443/p"))
  }

  test("paths: trailing-slash runs collapse, empty path becomes root") {
    assert(canon(
      "https://ex.com",
      "https://ex.com/",
      "https://ex.com///",
      "https://ex.com/a///",
      "https://ex.com/a/b"
    ) == Seq(
      "https://ex.com/",
      "https://ex.com/",
      "https://ex.com/",
      "https://ex.com/a",
      "https://ex.com/a/b"))
  }

  test("queries: all-utm drops the '?', empty fragment-only query drops") {
    assert(canon(
      "https://ex.com/p?utm_source=a&utm_medium=b",
      "https://ex.com/p?#frag",
      "https://ex.com/p?a=1&&b=2" // empty param from '&&' is dropped
    ) == Seq(
      "https://ex.com/p",
      "https://ex.com/p",
      "https://ex.com/p?a=1&b=2"))
  }

  test("non-absolute inputs pass through unchanged") {
    val odd = Seq("ex.com/path?b=1", "mailto:a@ex.com", "/rel/path", "", "not a url")
    assert(canon(odd: _*) == odd)
  }

  test("canonicalize is idempotent") {
    val messy = Seq(
      "HTTPS://WWW.Ex.COM:443/a/b?b=2&a=1&utm_source=x#frag",
      "http://Host.Org:80/p?z=9&y=8",
      "https://ex.com///",
      "https://ex.com/p?utm_source=a")
    val once = canon(messy: _*)
    assert(canon(once: _*) == once)
  }
}
