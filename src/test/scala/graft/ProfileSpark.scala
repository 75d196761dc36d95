package graft
import graft.core.Doc
import graft.corpus.Corpus
import graft.engine.RuleCompiler
import graft.rules.RuleParser
import graft.spark.ShadowSpark
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer
object ProfileSpark {
  val path = "/tmp/graft_bench_corpus"
  def mkCorpus(n: Long): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Corpus.generate(spark, n, 96).write.mode("overwrite").parquet(path)
    spark.stop()
  }
  def run(cpus: Int, n: Long): Double = {
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "32k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val errs = new ArrayBuffer[String]
    val program = RuleCompiler.compile(Seq(
      RuleParser.parseStr(Corpus.headRules, errs),
      RuleParser.parseStr(Corpus.corpusRules, errs)))
    def once(): Double = {
      val t0 = System.nanoTime()
      ShadowSpark.processColumnar(spark.read.parquet(path), program).count()
      (System.nanoTime()-t0)/1e9
    }
    def onceGen(): Double = {
      val t0 = System.nanoTime()
      ShadowSpark.process(Corpus.generate(spark, n, cpus*6), program).count()
      (System.nanoTime()-t0)/1e9
    }
    once(); once(); onceGen()
    val walls = (1 to 5).map(_ => once()).sorted
    val wallsG = (1 to 5).map(_ => onceGen()).sorted
    println(f"[$cpus cpus] parquet walls=${walls.map(w=>f"$w%.2f").mkString(",")} best=${n/walls.head}%.0f docs/s")
    println(f"[$cpus cpus] genjob  walls=${wallsG.map(w=>f"$w%.2f").mkString(",")} best=${n/wallsG.head}%.0f docs/s")
    spark.stop()
    n/walls.head
  }
  def main(args: Array[String]): Unit = {
    val n = 500000L
    mkCorpus(n)
    val d4 = run(4, n); val d16 = run(16, n); val d8 = run(8, n); val d32 = run(32, n)
    println(f"efficiency(4->16)=${(d16/d4)/4}%.3f")
    println(f"efficiency(median)=${(d32/d8)/4}%.3f")
  }
}
