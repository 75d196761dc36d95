package graft

import graft.corpus.Corpus
import graft.engine.RuleCompiler
import graft.rules.RuleParser
import graft.spark.ShadowSpark
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Scaling measurement on a REAL multi-executor cluster, sandbox edition:
  * `local-cluster[n, 4, mem]` forks n genuine executor JVMs (own heap, GC,
  * JIT, shuffle server) against an in-process master+workers — the closest
  * local model of "spark-submit at N vs 4N executors" the north rule asks
  * for: 1 executor vs 4 executors of 4 cores each. Prints one wall per
  * invocation like BenchChild (GRAFT_WALL=seconds).
  */
object BenchCluster {
  def main(args: Array[String]): Unit = {
    val Array(corpusPath, nDocsS, nExecS) = args
    val nDocs = nDocsS.toLong
    val nExec = nExecS.toInt
    val s = SparkSession.builder()
      .master(s"local-cluster[$nExec, 4, 4096]")
      .appName(s"graft-cluster-$nExec")
      .config("spark.executor.memory", "4g")
      // size each executor JVM for its 4 cores: without this every executor
      // sees all 32 host cpus and spawns ~23 ParallelGC threads (4 executors
      // = ~92 GC threads thrashing), which made 4 executors SLOWER than 1
      .config("spark.executor.extraJavaOptions",
        "-XX:ActiveProcessorCount=4 -XX:+UseParallelGC -Xms4g -XX:+AlwaysPreTouch")
      // forked executors get only SPARK_HOME jars; add the app classes
      .config("spark.executor.extraClassPath",
        sys.env.getOrElse("SPARK_GRAFT_CLASSES",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath))
      .config("spark.sql.shuffle.partitions", nExec * 4)
      .config("spark.sql.adaptive.enabled", "true")
      // split-size sweep (2026-08-16, 300k docs, 1 vs 4 executors): 2m
      // splits beat 8m/16m on the 4-executor side — with ~450 MB of input,
      // 16 cores need many task waves for balance, so wave granularity
      // dominates the per-task RPC cost the larger splits were meant to cut
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MPB", "2m"))
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try {
      val errs = new ArrayBuffer[String]
      val program = RuleCompiler.compile(Seq(
        RuleParser.parseStr(Corpus.headRules, errs),
        RuleParser.parseStr(Corpus.corpusRules, errs)))
      // warmup x2: each executor has only one C2 compiler thread at
      // ActiveProcessorCount=4, so a single pass can leave a JIT backlog
      ShadowSpark.processColumnar(s.read.parquet(corpusPath), program).count()
      ShadowSpark.processColumnar(s.read.parquet(corpusPath), program).count()
      val t0 = System.nanoTime()
      val n = ShadowSpark.processColumnar(s.read.parquet(corpusPath), program).count()
      require(n == nDocs, s"row count $n != $nDocs")
      println(f"GRAFT_WALL=${(System.nanoTime() - t0) / 1e9}%.4f")
    } finally s.stop()
  }
}