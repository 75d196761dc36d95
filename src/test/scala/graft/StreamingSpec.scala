package graft

import graft.core.DocOut
import graft.corpus.Corpus
import graft.engine.RuleCompiler
import graft.rules.RuleParser
import graft.spark.ShadowSpark
import graft.streaming.StreamingExtract
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("streaming extraction matches batch row-for-row (stateless map)") {
    val errs = new ArrayBuffer[String]
    val program = RuleCompiler.compile(Seq(
      RuleParser.parseStr(Corpus.headRules, errs),
      RuleParser.parseStr(Corpus.corpusRules, errs)))

    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Corpus.generate(spark, 120, 3).write.mode("overwrite").parquet(dir)

    val q = StreamingExtract.stream(spark, dir, program)
      .writeStream.format("memory").queryName("graft_stream_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_stream_out").as[DocOut]
        .collect().sortBy(_.doc_id).toSeq
      val batch = ShadowSpark.process(Corpus.generate(spark, 120, 3), program)
        .collect().sortBy(_.doc_id).toSeq
      assert(streamed.size == 120)
      assert(streamed == batch)
    } finally q.stop()
  }
}
