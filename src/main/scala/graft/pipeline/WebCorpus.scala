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
    * Scale: ONE shuffle on the domain; the window sort is O(k log k) per
    * domain and spillable, so mega-domains (the reason the cap exists)
    * stay bounded; output is <= maxPerDomain rows per domain. For
    * pathological single-domain skew, AQE splits the sort; a two-phase
    * per-partition pre-cap (keep maxPerDomain per partition first) is the
    * further refinement at 10^12 docs and composes with this unchanged. */
  def domainCap(docs: DataFrame, domain: String = "source",
                maxPerDomain: Int = 2): DataFrame = {
    val w = Window.partitionBy(col(domain))
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.select(col("doc_id"), col(domain), col("n_chars"))
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
