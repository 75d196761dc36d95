package graft
import graft.corpus.Corpus
import graft.engine.{RuleCompiler, ShadowEngine}
import graft.rules.RuleParser
import scala.collection.mutable.ArrayBuffer
object Profile {
  def main(args: Array[String]): Unit = {
    val errs = new ArrayBuffer[String]
    val program = RuleCompiler.compile(Seq(
      RuleParser.parseStr(Corpus.headRules, errs),
      RuleParser.parseStr(Corpus.corpusRules, errs)))
    val eng = new ShadowEngine(program)
    // warmup
    (0 until 3000).foreach(i => eng.process(Corpus.makeDoc(i + 7)))
    // generation cost
    var t0 = System.nanoTime()
    val docs = (1 until 4000).map(i => Corpus.makeDoc(i)).toArray
    println(f"gen 4k docs: ${(System.nanoTime()-t0)/1e9}%.2f s, bytes=${docs.map(_.spans.map(_.text.length).sum).sum}")
    t0 = System.nanoTime()
    docs.foreach(eng.process)
    var dt = (System.nanoTime()-t0)/1e9
    println(f"process 4k normal docs: $dt%.2f s -> ${4000/dt}%.0f docs/s single-thread")
    // mega doc
    val mega = Corpus.makeDoc(1000)
    println(s"mega doc bytes=${mega.spans.map(_.text.length).sum}")
    t0 = System.nanoTime()
    (0 until 20).foreach(_ => eng.process(mega))
    dt = (System.nanoTime()-t0)/1e9
    println(f"process mega x20: $dt%.2f s -> ${dt/20*1000}%.1f ms/doc")
  }
}
