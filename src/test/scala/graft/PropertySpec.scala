package graft

import graft.core.{Doc, Span, SpanKinds}
import graft.corpus.Corpus
import graft.engine.{RuleCompiler, ShadowEngine}
import graft.rules.RuleParser
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Property tests (FIXTURES.md §5.2): chunking invariance over random split
  * boundaries, engine determinism, media passthrough, adversarial-input
  * robustness. Deterministic seeded trials (splitmix64) — reproducible
  * failures, no wall-clock/Random. */
class PropertySpec extends AnyFunSuite {

  val engine: ShadowEngine = {
    val errs = new ArrayBuffer[String]
    val p = RuleCompiler.compile(Seq(
      RuleParser.parseStr(Corpus.headRules, errs),
      RuleParser.parseStr(Corpus.corpusRules, errs)))
    new ShadowEngine(p)
  }

  private def rnd(seed: Long, k: Int): Long = Corpus.splitmix64(seed * 7919 + k)

  def splitAt(html: String, cuts: Seq[Int]): Doc = {
    val points = (cuts.map(c => math.floorMod(c, html.length + 1)) ++ Seq(0, html.length))
      .distinct.sorted
    val spans = points.zip(points.tail).zipWithIndex.map { case ((s, e), i) =>
      Span(SpanKinds.Html, html.substring(s, e), "", i)
    }
    Doc("p", spans)
  }

  test("chunking invariance: arbitrary split boundaries never change output (200 trials)") {
    (0 until 200).foreach { t =>
      val i = math.floorMod(rnd(t, 0), 5000L)
      val html = Corpus.html(i, megaEvery = 0)
      val cuts = (1 to 12).map(k => rnd(t, k).toInt)
      val whole = engine.process(Doc("p", Seq(Span(SpanKinds.Html, html, "", 0))))
      val split = engine.process(splitAt(html, cuts))
      assert(split.spans == whole.spans, s"trial $t (doc $i)")
      assert(split.data_json == whole.data_json, s"trial $t")
      assert(split.errors == whole.errors, s"trial $t")
    }
  }

  test("determinism: same doc repeatedly -> identical output") {
    (0 until 50).foreach { t =>
      val d = Corpus.makeDoc(math.floorMod(rnd(t, 100), 5000L))
      assert(engine.process(d) == engine.process(d), s"trial $t")
    }
  }

  test("media passthrough: refs preserved in order at arbitrary positions (100 trials)") {
    (0 until 100).foreach { t =>
      val i = math.floorMod(rnd(t, 200), 2000L)
      val html = Corpus.html(i, megaEvery = 0)
      val cuts = (1 to 5).map(k => math.floorMod(rnd(t, 200 + k), (html.length + 1).toLong).toInt)
        .distinct.sorted
      val spans = ArrayBuffer[Span]()
      var off = 0
      var prev = 0
      cuts.foreach { c =>
        if (c > prev) { spans += Span(SpanKinds.Html, html.substring(prev, c), "", off); off += 1; prev = c }
        spans += Span(SpanKinds.Media, "", s"media://p/$off", off); off += 1
      }
      if (prev < html.length) spans += Span(SpanKinds.Html, html.substring(prev), "", off)
      val out = engine.process(Doc("p", spans.toSeq))
      val inRefs = spans.filter(_.kind == SpanKinds.Media).map(_.media_ref).toSeq
      val outRefs = out.spans.filter(_.kind == SpanKinds.Media).map(_.media_ref)
      assert(outRefs == inRefs, s"trial $t")
      // non-media reconstruction equals the no-media run
      val noMedia = engine.process(Doc("p", Seq(Span(SpanKinds.Html, html, "", 0))))
      assert(out.spans.filterNot(_.kind == SpanKinds.Media).map(_.text).mkString ==
        noMedia.spans.map(_.text).mkString, s"trial $t")
      assert(out.data_json == noMedia.data_json, s"trial $t")
    }
  }

  test("parser survives adversarial fragments; output chunk-stable (200 trials)") {
    val pieces = Array(
      "<", ">", "</", "<!", "<!--", "-->", "<div", "\"", "'", "=", "x",
      " ", "<a href=", "<input ", "/>", "<script>", "</script>", "&amp;",
      "<option>", "</form>", "日本語", "<![CDATA[", "<p class='", "<!doctype html>",
      "<b style=", "<wbr>", "</div>", "<meta content=\"a b\">")
    (0 until 200).foreach { t =>
      val html = (0 until 40).map(k => pieces(math.floorMod(rnd(t, 300 + k), pieces.length.toLong).toInt)).mkString
      val out = engine.process(Doc("j", Seq(Span(SpanKinds.Html, html, "", 0))))
      val out2 = engine.process(splitAt(html, Seq(3, 7, 11, 23, 41)))
      assert(out2.spans == out.spans, s"trial $t html=$html")
      assert(out.errors.forall(!_.startsWith("[engine] internal error")), s"trial $t crashed: ${out.errors}")
    }
  }

  test("output html bytes reconstruct the input when no rules match") {
    val noop = RuleCompiler.compile(Seq(RuleParser.parseStr(
      """{ "s": "nonexistenttag", "hide": true }""", new ArrayBuffer[String])))
    val eng2 = new ShadowEngine(noop)
    (0 until 100).foreach { t =>
      val html = Corpus.html(math.floorMod(rnd(t, 400), 3000L), megaEvery = 0)
      val out = eng2.process(Doc("p", Seq(Span(SpanKinds.Html, html, "", 0))))
      // identity apart from the (empty-data) body injection script
      val got = out.spans.filter(_.kind == SpanKinds.Html).map(_.text).mkString
      val gotData = out.spans.filter(_.kind == SpanKinds.Data).map(_.text).mkString
      assert(got == html, s"trial $t")
      assert(gotData == "<script>var shadow_api_data = {};</script>", s"trial $t")
    }
  }
}
