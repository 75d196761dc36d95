package graft
import graft.corpus.Corpus
import graft.engine.{RuleCompiler, ShadowEngine}
import graft.rules.RuleParser
import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable.ArrayBuffer
object ProfileThreads {
  def main(args: Array[String]): Unit = {
    val errs = new ArrayBuffer[String]
    val program = RuleCompiler.compile(Seq(
      RuleParser.parseStr(Corpus.headRules, errs),
      RuleParser.parseStr(Corpus.corpusRules, errs)))
    val docs = (0 until 20000).map(i => Corpus.makeDoc(i)).toArray
    def run(nThreads: Int, rounds: Int): Double = {
      val counter = new AtomicLong(0)
      val total = docs.length.toLong * rounds
      val t0 = System.nanoTime()
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          val eng = new ShadowEngine(program)
          var i = 0L
          var next = counter.getAndIncrement()
          while (next < total) {
            val d = docs((next % docs.length).toInt)
            if (eng.process(d).errors.nonEmpty) sys.error("err")
            next = counter.getAndIncrement()
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val dt = (System.nanoTime()-t0)/1e9
      total/dt
    }
    run(8, 2) // warmup
    run(32, 2) // warmup
    for (n <- Seq(1, 8, 32, 8, 32)) {
      val dps = run(n, if (n == 1) 1 else 4)
      println(f"$n%2d threads: $dps%.0f docs/s")
    }
  }
}
