package graft.pipeline

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus curation operators a crawl-scale training pipeline needs
  * beyond dedup/quality: per-domain caps, deterministic mixture sampling,
  * and sequence packing. All integer-exact (externally replayable) and
  * single-shuffle shapes.
  */
object WebCorpus {

  /** Per-domain document cap (the standard anti-domination guard in crawl
    * curation: no domain may contribute more than `maxPerDomain` docs):
    * rank docs within their domain by (quality desc, doc_id asc) and keep
    * the top `maxPerDomain`.
    *
    * Scale: TWO-phase top-k. Phase 1 caps each INPUT partition to its own
    * per-domain top `maxPerDomain` before anything shuffles (a bounded
    * min-heap per in-flight domain, flushed in chunks of
    * `flushDomains` distinct domains so task memory stays bounded even
    * when every row is a new domain). Because (n_chars desc, doc_id asc)
    * is a total order, the per-partition survivors are a superset of the
    * global per-domain top-k, so phase 2 — ONE shuffle on the domain +
    * the rank window — is exact and unchanged. Shuffle volume drops from
    * all rows to at most partitions x domains x cap: for the mega-domain
    * this operator exists for (10^9 rows of one domain across 10^5
    * partitions at cap 2), that is the difference between shuffling 10^9
    * rows into one hot reducer and shuffling 2x10^5. Phase 1 is the only
    * typed (non-codegen) hop in the repo's relational layer and earns it:
    * it is a row-NARROWING step Catalyst has no bounded-partial-top-k
    * aggregate for. */
  def domainCap(docs: DataFrame, domain: String = "source",
                maxPerDomain: Int = 2, prePartitionCap: Boolean = true,
                flushDomains: Int = 100000): DataFrame = {
    val narrowed = docs.select(col("doc_id"), col(domain), col("n_chars"))
    val phase1 =
      if (!prePartitionCap) narrowed
      else {
        val schema = narrowed.schema
        val capped = narrowed.mapPartitions { it =>
          import org.apache.spark.sql.Row
          import scala.collection.mutable
          // dequeues the WORST kept row first: smaller n_chars is worse,
          // ties broken by larger doc_id worse — the same total order the
          // phase-2 window ranks by, which is what makes phase 1 lossless
          val byWorse = new Ordering[(Long, Long, Row)] {
            def compare(a: (Long, Long, Row), b: (Long, Long, Row)): Int = {
              val c = java.lang.Long.compare(b._1, a._1)
              if (c != 0) c else java.lang.Long.compare(a._2, b._2)
            }
          }
          val heaps = mutable.HashMap.empty[String, mutable.PriorityQueue[(Long, Long, Row)]]
          def add(r: Row): Unit = {
            val nc = r.getAs[Number](2).longValue()
            val id = r.getAs[Number](0).longValue()
            val h = heaps.getOrElseUpdate(r.getAs[String](1),
              mutable.PriorityQueue.empty[(Long, Long, Row)](byWorse))
            if (h.size < maxPerDomain) h.enqueue((nc, id, r))
            else if (byWorse.compare((nc, id, r), h.head) < 0) {
              h.dequeue(); h.enqueue((nc, id, r))
            }
          }
          def drain(): Iterator[Row] = {
            val out = heaps.valuesIterator.flatMap(_.iterator.map(_._3)).toVector
            heaps.clear()
            out.iterator
          }
          // chunked: consume until flushDomains distinct domains are in
          // flight, emit their survivors, repeat — bounded memory at any
          // domain cardinality, still a per-domain top-k superset
          new Iterator[Iterator[Row]] {
            private var done = false
            def hasNext: Boolean = !done
            def next(): Iterator[Row] = {
              while (it.hasNext && heaps.size < flushDomains) add(it.next())
              if (!it.hasNext) done = true
              drain()
            }
          }.flatten
        }(org.apache.spark.sql.Encoders.row(schema))
        capped.toDF(narrowed.columns: _*)
      }
    val w = Window.partitionBy(col(domain))
      .orderBy(col("n_chars").desc, col("doc_id"))
    phase1
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= maxPerDomain)
  }

  /** Deterministic mixture sampling (per-source rates — the "data mixture"
    * step of pre-training corpus assembly): doc kept iff
    * pmod(fingerprint64(source ':' doc_id), 1000) < rate_permille(source).
    * The hash is the FNV fingerprint already used by tx4, so an external
    * engine replays the keep-decision bit-for-bit; sampling is stable
    * under reruns and independent of row order/partitioning.
    *
    * Scale: the keep-decision is a scan-local projection (no shuffle); the
    * summary aggregate here is one partial+final hash-agg on the source. */
  def mixtureSample(docs: DataFrame, ratePermille: DataFrame => org.apache.spark.sql.Column)
      : DataFrame = {
    val keyed = docs.withColumn("rate_permille", ratePermille(docs))
      .withColumn("keep",
        (pmod(fingerprint64(concat(col("source"), lit(":"), col("doc_id").cast("string"))),
          lit(1000L)) < col("rate_permille")).cast("int"))
    keyed.groupBy(col("source"), col("rate_permille"))
      .agg(count(lit(1)).as("n_total"), sum(col("keep")).as("n_kept"))
  }

  /** Sequence packing (GPT-style pre-training batching: documents are
    * concatenated in order and cut into fixed `budget`-token sequences;
    * a doc can straddle a cut). Emits each doc's token count, running
    * total within its shard, and the first/last sequence index it lands
    * in.
    *
    * Scale: a GLOBAL concatenation order would be a single giant range
    * partition; real pipelines pack within shards — here the shard is the
    * source column, so the cumulative-sum window runs per shard in
    * parallel (one shuffle, O(k log k) per shard, spillable). */
  def seqPacking(docs: DataFrame, budget: Int = 512): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("first_seq", expr(s"(cum_tokens - n_tokens) div $budget"))
      .withColumn("last_seq", expr(s"(cum_tokens - 1) div $budget"))
  }
}
