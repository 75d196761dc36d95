package graft

import graft.core.{Doc, Span, SpanKinds}
import graft.engine.{EngineConfig, RuleCompiler, ShadowEngine}
import graft.rules.RuleParser
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Fidelity gate: the reference's own integration tests re-encoded
  * (north rule: span-sequence equality on (kind, text, media_ref, order)
  * plus exact data_json). */
class EngineGoldenSpec extends AnyFunSuite {

  /** Split a document into html spans of the given chunk size (the
    * reference proves chunk-size invariance at whole/100B/10B,
    * tests/test.rs:322,384). */
  def chunkedDoc(id: String, html: String, chunkSize: Int): Doc = {
    if (chunkSize <= 0 || chunkSize >= html.length)
      Doc(id, Seq(Span(SpanKinds.Html, html, "", 0)))
    else {
      val spans = html.grouped(chunkSize).zipWithIndex
        .map { case (c, i) => Span(SpanKinds.Html, c, "", i) }.toSeq
      Doc(id, spans)
    }
  }

  def g1Engine(): ShadowEngine = {
    val errors = new ArrayBuffer[String]
    val r1 = RuleParser.parseStr(Fixtures.shadowJson1, errors)
    val r2 = RuleParser.parseStr(Fixtures.shadowJson2, errors)
      .transformStrings(_.replace("Append", "AppendModified")) // tests/test.rs:312-318
    assert(errors.isEmpty, s"rule parse errors: $errors")
    val program = RuleCompiler.compile(
      Seq(r1, r2),
      EngineConfig(dataFormatter = d => s"<script>var my_data = $d;</script>"))
    assert(program.compileErrors.isEmpty, s"compile errors: ${program.compileErrors}")
    new ShadowEngine(program)
  }

  def concatHtml(out: graft.core.DocOut): String =
    out.spans.filter(s => s.kind == SpanKinds.Html || s.kind == SpanKinds.Data)
      .map(_.text).mkString

  test("g1_full_rewrite: reference integration test, whole doc") {
    val out = g1Engine().process(chunkedDoc("g1", Fixtures.htmlSource, 0))
    assert(out.errors.isEmpty, s"errors: ${out.errors}")
    assert(out.data_json == Fixtures.expectedDataJson)
    assert(concatHtml(out) == Fixtures.htmlResult)
  }

  test("g1_chunks: 100B and 10B chunking produce identical output") {
    val whole = g1Engine().process(chunkedDoc("g1", Fixtures.htmlSource, 0))
    for (cs <- Seq(100, 10, 7, 1)) {
      val out = g1Engine().process(chunkedDoc("g1", Fixtures.htmlSource, cs))
      assert(out.errors.isEmpty)
      assert(out.spans == whole.spans, s"chunk size $cs differs")
      assert(out.data_json == whole.data_json)
    }
  }

  test("g2_empty_content_upsert (tests/test.rs:398-439)") {
    val errors = new ArrayBuffer[String]
    val rule = RuleParser.parseStr(Fixtures.emptyTitleRules, errors)
    val program = RuleCompiler.compile(Seq(rule), EngineConfig(dataFormatter = _ => ""))
    val out = new ShadowEngine(program).process(chunkedDoc("g2", Fixtures.emptyTitleSource, 0))
    assert(out.errors.isEmpty)
    assert(concatHtml(out) == Fixtures.emptyTitleExpected)
  }

  test("g3_subtree_upsert_utf8 (tests/test_edge_cases.rs)") {
    val errors = new ArrayBuffer[String]
    val rule = RuleParser.parseStr(Fixtures.h3Rules, errors)
    val program = RuleCompiler.compile(Seq(rule), EngineConfig(dataFormatter = _ => ""))
    val out = new ShadowEngine(program).process(chunkedDoc("g3", Fixtures.h3Source, 0))
    assert(out.errors.isEmpty)
    assert(concatHtml(out) == Fixtures.h3Expected)
    // multi-byte chunking must not change anything
    val out2 = new ShadowEngine(program).process(chunkedDoc("g3", Fixtures.h3Source, 5))
    assert(out2.spans == out.spans)
  }

  test("g4_media_interleave: media spans pass through in order") {
    val html = Fixtures.htmlSource
    // split into 100-char html spans with a media span after every other one
    val parts = html.grouped(100).toVector
    val spans = ArrayBuffer[Span]()
    var off = 0
    parts.zipWithIndex.foreach { case (p, i) =>
      spans += Span(SpanKinds.Html, p, "", off); off += 1
      if (i % 2 == 1) { spans += Span(SpanKinds.Media, "", s"media://g4/$i", off); off += 1 }
    }
    val out = g1Engine().process(Doc("g4", spans.toSeq))
    assert(out.errors.isEmpty)
    // 1) html+data concatenation equals the golden result
    assert(concatHtml(out) == Fixtures.htmlResult)
    // 2) media refs preserved, in input order
    val refs = out.spans.filter(_.kind == SpanKinds.Media).map(_.media_ref)
    val expectedRefs = spans.filter(_.kind == SpanKinds.Media).map(_.media_ref).toSeq
    assert(refs == expectedRefs)
    // 3) offsets are the output ordinal
    assert(out.spans.map(_.offset) == out.spans.indices)
    assert(out.data_json == Fixtures.expectedDataJson)
  }

  test("data span is emitted separately before </body>") {
    val out = g1Engine().process(chunkedDoc("g1", Fixtures.htmlSource, 0))
    val kinds = out.spans.map(_.kind)
    assert(kinds.count(_ == SpanKinds.Data) == 1)
    val dataIdx = kinds.indexOf(SpanKinds.Data)
    assert(out.spans(dataIdx).text.startsWith("<script>var my_data = "))
    // the following html span starts with </body>
    assert(out.spans(dataIdx + 1).text.startsWith("</body>"))
  }
}
