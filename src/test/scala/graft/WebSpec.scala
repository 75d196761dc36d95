package graft

import graft.functions.{Robots, Urls}
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization (RFC 3986 normalization) and robots.txt
  * (RFC 9309) — cases lifted from the RFCs' own examples plus the
  * hostile shapes a crawl actually serves. */
class WebSpec extends AnyFunSuite {

  // ---- URL canonicalization ----

  test("url: scheme/host lowercase, default port + fragment stripped, empty path -> /") {
    assert(Urls.canonicalize("HTTP://WWW.Example.COM:80#top") == "http://www.example.com/")
    assert(Urls.canonicalize("https://Example.com:443/a") == "https://example.com/a")
    assert(Urls.canonicalize("https://example.com:8443/a") == "https://example.com:8443/a")
    assert(Urls.canonicalize("http://example.com.") == "http://example.com/")
  }

  test("url: RFC 3986 dot-segment removal") {
    assert(Urls.canonicalize("http://e.com/a/./b/../c") == "http://e.com/a/c")
    assert(Urls.canonicalize("http://e.com/a/b/c/./../../g") == "http://e.com/a/g")
    assert(Urls.canonicalize("http://e.com/../../x") == "http://e.com/x")
    assert(Urls.canonicalize("http://e.com/a/..") == "http://e.com/")
    assert(Urls.canonicalize("http://e.com/a/.") == "http://e.com/a/")
  }

  test("url: percent normalization — unreserved decoded, rest uppercased, junk preserved") {
    assert(Urls.canonicalize("http://e.com/%41sset%2f?q=%31%2f") == "http://e.com/Asset%2F?q=1%2F")
    assert(Urls.canonicalize("http://e.com/%7Euser") == "http://e.com/~user")
    assert(Urls.canonicalize("http://e.com/a%zz") == "http://e.com/a%zz") // malformed escape
  }

  test("url: userinfo stripped, empty query dropped, query preserved in order") {
    assert(Urls.canonicalize("http://u:pw@e.com/p?") == "http://e.com/p")
    assert(Urls.canonicalize("http://e.com/p?b=2&a=1") == "http://e.com/p?b=2&a=1")
    assert(Urls.canonicalize("http://e.com/p#f?notquery") == "http://e.com/p")
  }

  test("url: unparseable returns the empty sentinel") {
    assert(Urls.canonicalize("not a url") == "")
    assert(Urls.canonicalize("://nohost") == "")
    assert(Urls.canonicalize("http://") == "")
    assert(Urls.canonicalize("1http://e.com/") == "")
    assert(Urls.canonicalize("http://e.com:bad/") == "")
  }

  test("url: registered domain under the static suffix subset") {
    assert(Urls.registeredDomain("www.blog.example.com") == "example.com")
    assert(Urls.registeredDomain("cdn.assets.shop.CO.UK") == "shop.co.uk")
    assert(Urls.registeredDomain("user3.github.io") == "user3.github.io")
    assert(Urls.registeredDomain("deep.user3.github.io") == "user3.github.io")
    assert(Urls.registeredDomain("example.com") == "example.com")
    assert(Urls.registeredDomain("com") == "com")
    assert(Urls.registeredDomain("localhost") == "localhost")
    assert(Urls.urlRegisteredDomain("https://a.b.example.com:8443/x") == "example.com")
    assert(Urls.urlRegisteredDomain("garbage") == "")
  }

  test("url: RFC 3986 §5.4 reference resolution examples") {
    val base = "http://a/b/c/d;p?q"
    def r(ref: String) = Urls.resolve(base, ref)
    assert(r("g") == "http://a/b/c/g")
    assert(r("./g") == "http://a/b/c/g")
    assert(r("g/") == "http://a/b/c/g/")
    assert(r("/g") == "http://a/g")
    assert(r("//g") == "http://g/") // canonical form adds the root path
    assert(r("?y") == "http://a/b/c/d;p?y")
    assert(r("g?y") == "http://a/b/c/g?y")
    assert(r("#s") == "http://a/b/c/d;p?q") // fragment dropped by canon
    assert(r("") == "http://a/b/c/d;p?q")
    assert(r(";x") == "http://a/b/c/;x")
    assert(r("g;x") == "http://a/b/c/g;x")
    assert(r(".") == "http://a/b/c/")
    assert(r("..") == "http://a/b/")
    assert(r("../g") == "http://a/b/g")
    assert(r("../..") == "http://a/")
    assert(r("../../g") == "http://a/g")
    assert(r("../../../g") == "http://a/g") // abnormal: clamps at root
    assert(r("http://x.org/abs") == "http://x.org/abs")
    assert(r("https://x.org:8443/s") == "https://x.org:8443/s")
    // non-hierarchical targets are not crawlable links
    assert(r("mailto:user@example.com") == "")
    assert(Urls.resolve("not a base", "g") == "")
  }

  // ---- sitemaps ----

  test("sitemap: urlset entries with entities, defaults, and malformed blocks") {
    import graft.pipeline.WebArchive
    val xml = "<?xml version=\"1.0\"?><urlset xmlns=\"x\">" +
      "<url><loc>https://e.com/a?x=1&amp;y=2</loc><lastmod>2026-01-01</lastmod>" +
      "<priority>0.8</priority></url>" +
      "<url><loc>https://e.com/b</loc></url>" + // no lastmod/priority -> defaults
      "<url><lastmod>2026-01-02</lastmod></url>" + // no loc -> skipped
      "</urlset>"
    val es = WebArchive.sitemapEntries(xml)
    assert(es.length == 2)
    assert(es(0).loc == "https://e.com/a?x=1&y=2" && es(0).priority == 0.8)
    assert(es(1).loc == "https://e.com/b" && es(1).lastmod == "" && es(1).priority == 0.5)
    assert(es.map(_.kind).forall(_ == "url"))
  }

  test("sitemap: sitemapindex entries and truncated container") {
    import graft.pipeline.WebArchive
    val idx = "<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc></sitemap>" +
      "<sitemap><loc>https://e.com/s2.xml</loc></sitemap></sitemapindex>"
    val es = WebArchive.sitemapEntries(idx)
    assert(es.map(_.loc) == Vector("https://e.com/s1.xml", "https://e.com/s2.xml"))
    assert(es.forall(_.kind == "sitemap"))
    // an unterminated block parses what's complete, never throws
    val trunc = "<urlset><url><loc>https://e.com/ok</loc></url><url><loc>https://e.com/cut"
    assert(WebArchive.sitemapEntries(trunc).map(_.loc) == Vector("https://e.com/ok"))
  }

  // ---- HTML character references ----

  test("html: named subset and numeric (dec/hex incl. astral) references decode") {
    import graft.functions.HtmlText
    assert(HtmlText.unescape("&lt;b&gt; caf&eacute; &amp;co") == "<b> café &co")
    assert(HtmlText.unescape("&#233; &#xE9; &#x1F600;") == "é é 😀")
    assert(HtmlText.unescape("no references here") == "no references here")
    assert(HtmlText.unescape("&copy;&euro;&nbsp;!") == "©€ !")
  }

  test("html: unknown/unterminated/out-of-range references handled the WHATWG way") {
    import graft.functions.HtmlText
    assert(HtmlText.unescape("&unknown; stays") == "&unknown; stays")
    assert(HtmlText.unescape("AT&T and R&D") == "AT&T and R&D")
    assert(HtmlText.unescape("trailing &") == "trailing &")
    assert(HtmlText.unescape("&#zz; stays") == "&#zz; stays")
    assert(HtmlText.unescape("&#0;") == "�")
    assert(HtmlText.unescape("&#x110000;") == "�")
    assert(HtmlText.unescape("&#xD800;") == "�")
    // a ';' too far away is not a reference
    assert(HtmlText.unescape("& " + ("x" * 40) + ";") == "& " + ("x" * 40) + ";")
    assert(HtmlText.unescape("&&amp;") == "&&")
  }

  // ---- robots.txt ----

  private val robots =
    """# graft test robots
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/public/
      |Disallow: /*.pdf$
      |
      |User-agent: otherbot
      |User-agent: thirdbot
      |Disallow:
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  test("robots: longest match wins; allow beats disallow on a tie") {
    assert(!Robots.decide(robots, "graftbot", "/private/secret.html")._1)
    assert(Robots.decide(robots, "graftbot", "/private/public/x.html")._1)
    assert(Robots.decide(robots, "graftbot", "/open/x.html")._1)
    // tie: same length allow + disallow
    val tie = "User-agent: *\nDisallow: /dir/\nAllow: /dir*\n"
    assert(Robots.decide(tie, "any", "/dir/")._1) // allow /dir* (5) vs disallow /dir/ (5)
  }

  test("robots: wildcard and end anchor") {
    assert(!Robots.decide(robots, "graftbot", "/docs/file.pdf")._1)
    assert(Robots.decide(robots, "graftbot", "/docs/file.pdfx")._1) // $ anchor
    assert(Robots.decide(robots, "graftbot", "/x.pdf.html")._1)
    val multi = "User-agent: *\nDisallow: /a*b*c\n"
    assert(!Robots.decide(multi, "any", "/a-x-b-y-c-z")._1)
    assert(Robots.decide(multi, "any", "/a-x-c-y-b")._1) // parts out of order
  }

  test("robots: group selection — named token beats *, stacked agents share rules") {
    assert(Robots.decide(robots, "otherbot", "/anything")._1)  // empty Disallow = allow all
    assert(Robots.decide(robots, "THIRDBOT", "/anything")._1)  // case-insensitive, stacked
    assert(!Robots.decide(robots, "strangerbot", "/anything")._1) // falls to *: Disallow /
    assert(Robots.decide(robots, "strangerbot", "/a")._2 == "/")
  }

  test("robots: rules before any user-agent are ignored; CRLF accepted; no groups = allowed") {
    val stray = "Disallow: /\r\nUser-agent: *\r\nAllow: /ok\r\nDisallow: /ok/no\r\n"
    assert(Robots.decide(stray, "any", "/secret")._1) // stray Disallow ignored
    assert(!Robots.decide(stray, "any", "/ok/no")._1)
    assert(Robots.decide("", "any", "/x") == (true, ""))
    assert(Robots.decide("# only comments\n", "any", "/x") == (true, ""))
  }

  test("robots: matched rule reporting") {
    assert(Robots.decide(robots, "graftbot", "/private/secret")._2 == "/private/")
    assert(Robots.decide(robots, "graftbot", "/private/public/a")._2 == "/private/public/")
    assert(Robots.decide(robots, "graftbot", "/open/a")._2 == "")
  }
}
