package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as built-ins, in their 100 TB shapes.
  * Both avoid the naive range-join plan (per-key cartesian of the two
  * sides), which is the classic scale-killer for temporal joins on hot
  * keys.
  */
object Relational {

  /** As-of join, union+window shape: for every left row, the latest right
    * row of the same key with right time <= left time (inclusive).
    *
    * Instead of `left JOIN right ON key AND r.ts <= l.ts` + keep-latest
    * (which materializes O(|L_k| * |R_k|) pairs per key before pruning —
    * quadratic on hot keys), both sides are union-tagged and ONE shuffle
    * on the key plus one ordered window computes the running latest right
    * payload: right rows sort before left rows at equal time, and
    * `max(struct(time, payload))` over the unbounded-preceding frame
    * carries the as-of value to each left row. O(n log n) per key,
    * spillable, zero pair blowup.
    *
    * Ties: equal right times resolve by the payload's struct ordering
    * (greatest wins) — pass a payload whose first fields make the
    * tie-break explicit. Left rows with no prior right row get a null
    * `asof` column.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               payload: Column): DataFrame = {
    // the helper claims these names for the union+window protocol; an
    // input that already owns one would be silently clobbered (same
    // failure mode mergeUpsert guards against) — fail loudly instead
    val claimed = Seq("__side", "__p", "__asof", "asof")
    val owned = (left.columns ++ right.columns).filter(claimed.contains)
    require(owned.isEmpty,
      s"asofJoin: input tables must not have ${owned.distinct.mkString("/")} " +
        "columns (they carry the as-of protocol; rename them first)")
    val r = right.select(col(key), col(time), payload.as("__p"))
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof",
        max(when(col("__side") === 0, struct(col(time), col("__p")))).over(w))
      .where(col("__side") === 1)
      .select(left.columns.map(col) :+ col("__asof.__p").as("asof"): _*)
  }

  /** Bounded-delta range join, bucket shape: for every left row, count
    * right rows of the same key within +-`deltaSec` seconds (inclusive).
    *
    * The scale mechanics: time is bucketed at `deltaSec` granularity; the
    * left side explodes to its bucket and the two adjacent ones (3 rows),
    * the right side keeps one row — the join is then a pure EQUI-join on
    * (key, bucket) whose candidate set per row is bounded by the bucket
    * population, never the full key population; the exact |dt| <= delta
    * predicate filters the candidates. Shuffle volume = 3x left + 1x
    * right keys; hot (key, bucket) pairs split by AQE skew handling. This
    * is how a 100 TB temporal-window join avoids both the cartesian and
    * an unbounded sort window.
    */
  /** CDC merge (MERGE INTO semantics, batch shape): apply a change set
    * (op = "upsert"/"delete" + full payload + a version > 0) onto a base
    * table — the table-maintenance step for continuously re-crawled
    * corpora. Union + per-key window-max instead of the textbook full
    * outer join: ONE shuffle on the key, the winner per key is the
    * highest-version row (base rows are version 0), and a delete winner
    * drops the key. Versions must be unique per key; ties fall back to
    * op ordering for determinism.
    *
    * Scale: at 10^12 rows both sides bucket by the key (Iceberg bucket
    * transform) so the shuffle co-locates; the per-key window sort covers
    * base+changes rows of that key only, O(k log k), spillable. */
  def mergeUpsert(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    // the helper claims these two names for the merge protocol; a base
    // table that already owns them would be silently clobbered AND lose
    // the column in the output — fail loudly instead
    require(!base.columns.contains("version") && !base.columns.contains("op"),
      "mergeUpsert: base table must not have 'version'/'op' columns " +
        "(they carry the merge protocol; rename them first)")
    val b = base.withColumn("version", lit(0L)).withColumn("op", lit("upsert"))
    val u = b.unionByName(changes.select(b.columns.map(col): _*))
    val w = Window.partitionBy(col(key)).orderBy(col("version").desc, col("op"))
    u.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("op") === "upsert")
      .drop("__rn", "version", "op")
  }

  def rangeCount(left: DataFrame, right: DataFrame, key: String, time: String,
                 leftId: String, deltaSec: Long): DataFrame = {
    // same protocol-column guard as asofJoin/mergeUpsert: the bucketing
    // protocol claims these names on the (narrowed) left side and the
    // output claims n_within
    val claimed = Seq("__ts", "__b", "__b0", "__rk", "__rts", "__rb", "n_within")
    val owned = Seq(leftId, key, time).filter(claimed.contains)
    require(owned.isEmpty,
      s"rangeCount: input columns must not be named ${owned.distinct.mkString("/")} " +
        "(they carry the range-join protocol; rename them first)")
    val lsec = col(time).cast("timestamp").cast("long")
    // a right row has exactly ONE bucket and a left row probes three, so
    // every in-range (left, right) pair meets in exactly one bucket — no
    // double counting, no dedup pass
    val l = left.select(col(leftId), col(key), col(time))
      .withColumn("__ts", lsec)
      .withColumn("__b0", expr(s"__ts div $deltaSec"))
      .withColumn("__b", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
    val r = right.select(col(key).as("__rk"),
      col(time).cast("timestamp").cast("long").as("__rts"))
      .withColumn("__rb", expr(s"__rts div $deltaSec"))
    l.as("L").join(r.as("R"),
        col("L.__b") === col("R.__rb") && col(s"L.$key") === col("R.__rk") &&
          abs(col("L.__ts") - col("R.__rts")) <= deltaSec,
        "left")
      .groupBy(col(s"L.$leftId"), col(s"L.$key"), col(s"L.$time"))
      .agg(count(col("R.__rts")).as("n_within"))
  }
}
