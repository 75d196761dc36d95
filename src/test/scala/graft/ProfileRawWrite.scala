package graft

import graft.corpus.Corpus
import graft.engine.RuleCompiler
import graft.rules.RuleParser
import graft.spark.ShadowSpark
import scala.collection.mutable.ArrayBuffer

/** Write-shaped job comparison: typed path (DocOut objects + Encoder
  * SerializeFromObject) vs raw UnsafeRow emission, both into the noop sink
  * (full row production, no disk noise). Run:
  *   sbt -batch "Test/runMain graft.ProfileRawWrite [nDocs] [cpus]" */
object ProfileRawWrite {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 100000L
    val cpus = if (args.length > 1) args(1).toInt else 16
    val spark = Bench.session(cpus)
    val errs = new ArrayBuffer[String]
    val program = RuleCompiler.compile(Seq(
      RuleParser.parseStr(Corpus.headRules, errs),
      RuleParser.parseStr(Corpus.corpusRules, errs)))
    val dir = sys.props("java.io.tmpdir") + "/graft_profile_raw"
    Corpus.generate(spark, nDocs, 64).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)

    def time(tag: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"GRAFT_PROFILE $tag%-10s $s%8.2f s  ${nDocs / s}%10.0f docs/s")
      s
    }
    def typedJob(): Unit =
      ShadowSpark.processColumnar(df, program).write.format("noop").mode("overwrite").save()
    def rawJob(): Unit =
      ShadowSpark.processColumnarRaw(df, program).write.format("noop").mode("overwrite").save()

    typedJob(); rawJob() // warmup both
    (1 to 3).foreach { r =>
      time(s"typed#$r")(typedJob())
      time(s"raw#$r")(rawJob())
    }
    spark.stop()
  }
}
