package graft
import graft.core._, graft.engine._, graft.rules._
import scala.collection.mutable.ArrayBuffer
object DriveVerify {
  def main(args: Array[String]): Unit = {
    val errs = new ArrayBuffer[String]
    val rules = RuleParser.parseStr("""{"s":"div.x","edit":{"content":{"op":"upsert","val":"HI"}},"data":{"path":"out","values":{"t":{"source":"Contents"},"cls":{"source":"Attribute","name":"class"}}}}""", errs)
    val prog = RuleCompiler.compile(Seq(rules))
    val eng = new ShadowEngine(prog)
    val doc = Doc("d1", Seq(
      Span("html", "<html><body><div cla", "", 0),
      Span("media", "", "media://d1/0", 1),
      Span("html", "ss=\"x\">old text</div></body></html>", "", 2)))
    val out = eng.process(doc)
    println("OUT_SPANS=" + out.spans)
    println("DATA_JSON=" + out.data_json)
    println("ERRORS=" + out.errors)
    val bad = eng.process(Doc("d2", Seq(Span("html", "<div class=x>a<p>b</span><div class=\"x\">c", "", 0))))
    println("MALFORMED=" + bad.spans.map(_.text).mkString("|"))
    println("MALFORMED_JSON=" + bad.data_json + " ERR=" + bad.errors)
    val errs2 = new ArrayBuffer[String]
    val r2 = RuleParser.parseStr("""{"s":"div[", "hide":true}""", errs2)
    val p2 = RuleCompiler.compile(Seq(r2))
    println("COMPILE_ERRS=" + p2.compileErrors)
    val errs3 = new ArrayBuffer[String]
    RuleParser.parseStr("""{not json""", errs3)
    println("PARSE_ERRS=" + errs3)
    val e1 = eng.process(Doc("d3", Seq()))
    val e2 = eng.process(Doc("d4", Seq(Span("media", "payload", "media://d4/0", 0))))
    println("EMPTY=" + e1.spans + " MEDIAONLY=" + e2.spans)
    // boilerplate main-content extraction
    val bp = graft.engine.Boilerplate.mainContentSpans(
      "<div class=\"nav\"><a href=x>home</a></div><p>" + ("real content words here " * 11) + "</p>")
    println("BOILERPLATE=" + bp.map(_.text.take(40)))
  }
}
