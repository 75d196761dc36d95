package graft

import graft.pipeline.Dedup
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Failure-tolerance of the dedup closure: `Dedup.connectedComponents` uses
  * RELIABLE checkpoints, so a task that dies mid-run recomputes from the
  * checkpoint files and the job converges to identical labels. Needs task
  * retries, which local mode only grants via `local[n, maxFailures]` — so
  * this suite runs on its own SparkContext (suites execute sequentially in
  * the forked test JVM; the context is stopped again in afterAll). */
class CcFaultSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.builder()
      .master("local[4, 2]") // 2 task attempts: first may die, retry lands
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    super.afterAll()
  }

  test("connectedComponents converges identically when a task dies and is retried") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L)).toDF("id1", "id2")
    val nodes = (1L to 9L).toDF("doc_id")
    val clean = Dedup.connectedComponents(pairs, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // poison: attempt 0 of partition 0 throws wherever this stage runs —
    // the label-table checkpoint materialization (= the loop's data source)
    // loses a task, Spark retries the task (attempt 1 passes), and the
    // iterations proceed from the on-disk checkpoint
    val poisonedNodes = nodes.as[Long].mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException("injected task death (CcFaultSpec)")
      it
    }.toDF("doc_id")
    val poisonedPairs = pairs.as[(Long, Long)].mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException("injected task death (CcFaultSpec)")
      it
    }.toDF("id1", "id2")

    val faulty = Dedup.connectedComponents(poisonedPairs, poisonedNodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(faulty == clean)
    assert(clean == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L, 4L -> 4L, 7L -> 7L, 8L -> 8L))
  }

  test("connectedComponents fails loudly instead of returning partial labels") {
    import spark.implicits._
    // a 6-hop chain cannot close in 1 iteration of min-label propagation
    val chain = (1L to 6L).sliding(2).map(s => (s.head, s.last)).toSeq.toDF("id1", "id2")
    val nodes = (1L to 6L).toDF("doc_id")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, nodes, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
