package graft

import graft.operators.Web
import org.apache.spark.sql.functions._

/** URL canonicalization / registered-domain / URL-dedup contracts on
  * hand-built URLs covering every normalization rule. */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("u").select(Web.normalizeUrl(col("u"))).head().getString(0)

  test("normalizeUrl: case, port, fragment, tracking params, param order, trailing slash") {
    assert(norm("HTTPS://WWW.Src3.COM:443/en/article/7/?utm_source=feed&id=2&ref=tw#frag")
      == "https://www.src3.com/en/article/7?id=2")
    // tracking-only query loses its '?' entirely
    assert(norm("https://a.com/p?utm_a=1&gclid=x") == "https://a.com/p")
    // surviving params sort
    assert(norm("https://a.com/p?b=2&a=1") == "https://a.com/p?a=1&b=2")
    // root path: trailing slashes strip to the bare authority
    assert(norm("https://a.com/") == "https://a.com")
    assert(norm("HTTP://A.com:80/x") == "http://a.com/x")
    // no query at all
    assert(norm("https://a.com/x/y") == "https://a.com/x/y")
  }

  test("registeredDomain: 2-label, multi-label suffix, deep subdomain, single label") {
    val hosts = Seq("www.src.com", "src.co.uk", "a.b.src.com", "localhost",
      "src.com", "deep.www.src.org.uk")
    val got = hosts.toDF("h")
      .select(col("h"), Web.registeredDomain(col("h")))
      .as[(String, String)].collect().toMap
    assert(got("www.src.com") == "src.com")
    assert(got("src.co.uk") == "src.co.uk")
    assert(got("a.b.src.com") == "src.com")
    assert(got("localhost") == "localhost")
    assert(got("src.com") == "src.com")
    assert(got("deep.www.src.org.uk") == "src.org.uk")
  }

  test("urlDedup collapses case/order/tracking variants to the min-id keeper") {
    val rows = Seq(
      (10L, "https://a.com/p?b=2&a=1"),
      (3L, "HTTPS://A.COM:443/p/?a=1&b=2&utm_x=9"),   // same canonical, min id
      (7L, "https://a.com/p?a=1&b=2&fbclid=zz"),       // same canonical
      (5L, "https://a.com/p?a=1"),                     // different (missing b)
      (6L, "https://b.com/p?a=1&b=2"))                 // different host
      .toDF("doc_id", "url")
    val got = Web.urlDedup(rows, col("doc_id"), col("url"))
      .as[(String, Long, Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(got("https://a.com/p?a=1&b=2") == ((3L, 3L)))
    assert(got("https://a.com/p?a=1") == ((5L, 1L)))
    assert(got("https://b.com/p?a=1&b=2") == ((6L, 1L)))
  }

  test("domainStats: docs vs distinct canonical urls per registered domain") {
    val rows = Seq(
      (1L, "https://www.a.com/x?utm_s=1", 100L),
      (2L, "https://WWW.A.com/x/", 50L),        // same canonical as 1
      (3L, "https://blog.a.com/y", 30L),        // same domain, new url
      (4L, "https://a.co.uk/z", 20L))           // multi-label suffix domain
      .toDF("doc_id", "url", "n_chars")
    val got = Web.domainStats(rows, col("doc_id"), col("url"), col("n_chars"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (d, nd, nu, tc) => d -> ((nd, nu, tc)) }.toMap
    assert(got("a.com") == ((3L, 2L, 180L)))
    assert(got("a.co.uk") == ((1L, 1L, 20L)))
  }
}
