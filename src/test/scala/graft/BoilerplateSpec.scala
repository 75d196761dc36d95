package graft

import graft.engine.Boilerplate
import graft.html.HtmlParser
import org.scalatest.funsuite.AnyFunSuite

class BoilerplateSpec extends AnyFunSuite {

  val page: String =
    """<html><head><title>t</title><style>.x{}</style></head><body>
      |<div class="nav"><a href="/">home</a> <a href="/a">about</a> <a href="/b">contact</a></div>
      |<h1>The Article Headline Words Here</h1>
      |<p>This is the first long paragraph of real article content with plenty of
      |words so that the shallow text feature classifier counts well over sixteen
      |words and therefore treats it as main content rather than boilerplate.</p>
      |<p>A second substantial paragraph follows the first one and also contains
      |enough running text to be kept by the classifier as part of the extracted
      |main content of this little page.</p>
      |<div class="share"><a href="/tw">tweet</a> <a href="/fb">share</a></div>
      |<div class="footer"><a href="/imprint">imprint</a> <a href="/privacy">privacy</a> copyright</div>
      |</body></html>""".stripMargin

  test("blocks: segmentation, word counts, link density") {
    val bs = Boilerplate.blocks(HtmlParser.parse(page))
    assert(bs.exists(_.text.startsWith("home about")))
    val nav = bs.find(_.text.startsWith("home about")).get
    assert(nav.numWords == 3 && nav.linkWords == 3)
    val p1 = bs.find(_.text.startsWith("This is the first")).get
    assert(p1.numWords > 16 && p1.linkWords == 0)
    // style/title content must not appear
    assert(!bs.exists(_.text.contains(".x{}")))
  }

  test("content extraction keeps paragraphs, drops nav/share/footer") {
    val content = Boilerplate.contentBlocks(HtmlParser.parse(page)).map(_.text)
    assert(content.exists(_.startsWith("This is the first long paragraph")))
    assert(content.exists(_.startsWith("A second substantial paragraph")))
    assert(!content.exists(_.contains("home about")))
    assert(!content.exists(_.contains("tweet")))
    assert(!content.exists(_.contains("imprint")))
  }

  test("whitespace is normalized inside blocks") {
    val spans = Boilerplate.mainContentSpans("<p>" + ("word " * 30) + "\n   tail\t end</p>")
    assert(spans.length == 1)
    assert(spans.head.kind == "text")
    assert(spans.head.text == ("word " * 30).trim + " tail end")
  }

  test("all-links page yields no content") {
    val spans = Boilerplate.mainContentSpans(
      "<ul><li><a href=1>one two three</a></li><li><a href=2>four five six</a></li></ul>")
    assert(spans.isEmpty)
  }
}
