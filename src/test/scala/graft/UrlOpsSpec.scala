package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.urls.UrlOps

class UrlOpsSpec extends AnyFunSuite {

  test("resolve matches python urljoin on the common cases") {
    val base = "https://quotes.toscrape.com/page/2/"
    assert(UrlOps.resolve(base, "/page/3/") == "https://quotes.toscrape.com/page/3/")
    assert(UrlOps.resolve(base, "page/3/") == "https://quotes.toscrape.com/page/2/page/3/")
    assert(UrlOps.resolve(base, "../author/X") == "https://quotes.toscrape.com/page/author/X")
    assert(UrlOps.resolve(base, "//cdn.example/x.js") == "https://cdn.example/x.js")
    assert(UrlOps.resolve(base, "http://other.example/a") == "http://other.example/a")
    assert(UrlOps.resolve(base, "?q=1") == "https://quotes.toscrape.com/page/2/?q=1")
    assert(UrlOps.resolve(base, "#frag") == "https://quotes.toscrape.com/page/2/#frag")
    assert(UrlOps.resolve("https://a.example", "/x") == "https://a.example/x")
  }

  test("domain and path") {
    assert(UrlOps.urlDomain("https://a.example:8080/x?y#z") == "a.example:8080")
    assert(UrlOps.urlPath("https://a.example/x/y?q") == "/x/y")
    assert(UrlOps.hostOf("https://A.Example:8080/x") == "a.example")
  }

  test("transformUrl replicates the reference's reversed-regex quirk") {
    // '/' is a substring of '^(https?:)?//' -> treated as NOT relative
    assert(UrlOps.transformUrl("https://a.example/b", "/") == "/")
    // normal hrefs are treated as relative and joined
    assert(UrlOps.transformUrl("https://a.example/b", "c") == "https://a.example/c")
    assert(UrlOps.transformUrl("https://a.example/b", "https://x.example/y") == "https://x.example/y")
  }

  test("canonicalize: lowercase host, default port strip, sorted query, fragment strip") {
    assert(UrlOps.canonicalize("HTTPS://Host.Example:443/a/../b?z=1&a=2#f") ==
      "https://host.example/b?a=2&z=1")
    assert(UrlOps.canonicalize("http://h.example") == "http://h.example/")
    assert(UrlOps.canonicalize("http://h.example:8080/x") == "http://h.example:8080/x")
  }

  test("canonicalize is idempotent (property)") {
    val hosts = Seq("a.example", "B.example:8080", "c.d.example")
    val paths = Seq("/", "/x", "/x/y/../z", "", "/x/./y")
    val queries = Seq("", "?b=2&a=1", "?x")
    for (h <- hosts; p <- paths; q <- queries) {
      val u = s"http://$h$p$q"
      val c1 = UrlOps.canonicalize(u)
      assert(UrlOps.canonicalize(c1) == c1, s"not idempotent for $u")
    }
  }

  test("hash is stable") {
    assert(UrlOps.fnv1a64("abc") == UrlOps.fnv1a64("abc"))
    assert(UrlOps.urlHash64("http://a.example/x") ==
      UrlOps.urlHash64("http://A.EXAMPLE/x"))
  }
}
