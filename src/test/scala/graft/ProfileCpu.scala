package graft
object ProfileCpu {
  def alloc(iters: Long): Long = {
    var s = 0L; var i = 0L
    while (i < iters) {
      val a = new Array[Byte](4096)
      a(((i & 4095)).toInt) = i.toByte
      s += a((i % 4096).toInt); i += 1
    }
    s
  }
  def main(args: Array[String]): Unit = {
    import scala.jdk.CollectionConverters._
    println("JVMARGS=" + java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala.mkString(" "))
    println("maxMem=" + Runtime.getRuntime.maxMemory()/1048576 + "MB")
    for (n <- Seq(1, 8)) {
      val ts = (0 until n).map(_ => new Thread(() => { alloc(2000000L); () }))
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      val dt = (System.nanoTime()-t0)/1e9
      println(f"alloc n=$n: $dt%.2f s -> ${n*2000000L*4096/dt/1e9}%.2f GB/s")
    }
  }
}
