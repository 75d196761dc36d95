package graft

import org.apache.spark.sql.functions._

/** Probe: wall of the scan+assembly half of processColumnar (everything up
  * to — but excluding — the engine call) vs the full job, to size the
  * non-engine share and its scaling. Run:
  *   sbt -batch "Test/runMain graft.ProfileDecode <cpus>"
  */
object ProfileDecode {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 8
    val corpusPath = sys.props("java.io.tmpdir") + "/graft_bench_corpus"
    val s = Bench.session(cpus)
    import graft.html.HtmlParser
    val kindMedia = org.apache.spark.unsafe.types.UTF8String.fromString(graft.core.SpanKinds.Media)

    def assemblyOnly(): Long = {
      val df = s.read.parquet(corpusPath).select(col("doc_id"), col("spans"))
      df.queryExecution.toRdd.mapPartitions { it =>
        var buf = new Array[Byte](16384)
        val markers = new scala.collection.mutable.ArrayBuffer[HtmlParser.MediaMarker](8)
        var acc = 0L
        it.foreach { row =>
          val docId = row.getUTF8String(0).toString
          val arr = row.getArray(1)
          val n = arr.numElements()
          markers.clear()
          var bytePos = 0
          var i = 0
          while (i < n) {
            val st = arr.getStruct(i, 4)
            val kind = st.getUTF8String(0)
            if (kind == kindMedia) {
              markers += HtmlParser.MediaMarker(bytePos, st.getUTF8String(2).toString, st.getUTF8String(1).toString)
            } else {
              val u = st.getUTF8String(1)
              val nb = u.numBytes()
              if (bytePos + nb > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, bytePos + nb))
              u.writeTo(java.nio.ByteBuffer.wrap(buf, bytePos, nb))
              bytePos += nb
            }
            i += 1
          }
          val stream = new String(buf, 0, bytePos, java.nio.charset.StandardCharsets.UTF_8)
          acc += stream.length + docId.length + markers.length
        }
        Iterator.single(acc)
      }.sum().toLong
    }
    def fullJob(): Long = {
      val errs = new scala.collection.mutable.ArrayBuffer[String]
      val program = graft.engine.RuleCompiler.compile(Seq(
        graft.rules.RuleParser.parseStr(graft.corpus.Corpus.headRules, errs),
        graft.rules.RuleParser.parseStr(graft.corpus.Corpus.corpusRules, errs)))
      graft.spark.ShadowSpark.processColumnar(s.read.parquet(corpusPath), program).count()
    }
    def time(f: () => Long): Double = { val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9 }
    assemblyOnly(); fullJob() // warm
    (1 to 2).foreach { r =>
      val a = time(() => assemblyOnly())
      val fj = time(() => fullJob())
      println(f"PROFILE cpus=$cpus rep=$r assembly=$a%.2fs full=$fj%.2fs engineShare=${(fj - a) / fj}%.2f")
    }
    s.stop()
  }
}