package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range-bucketed as-of join — the skew-proof variant of
  * [[graft.plans.AsofJoinNative]].
  *
  * The native exec requires `ClusteredDistribution` on the join key, so
  * ONE hot key (or a keyless "latest global quote" as-of) serializes into
  * ONE task no matter how many executors exist. This formulation buckets
  * TIME instead: the only join that touches all rows is an equi-join on
  * (key, time-bucket), so a single key's work spreads over its time range
  * — parallelism = keys × buckets, which is exactly what a 100 TB
  * replay of a few hot instruments needs.
  *
  * Decomposition (per left row: latest right row with rts <= lts):
  *  1. same-bucket candidates — equi-join on (key, bucket), filter
  *     rts <= lts, per-left max_by;
  *  2. earlier-bucket carry — right rows compact to ONE row per
  *     (key, bucket) first (`max_by` hash-agg, map-side combined), the
  *     carry lookup then range-joins the COMPACTED per-bucket tables
  *     (keys × buckets rows, not data rows);
  *  3. union, per-left max_by, left-join back (null payload when no
  *     match anywhere).
  *
  * Bucket width trades fan-out in (1) — right rows per (key, bucket) —
  * against compacted-table size in (2); both are knobs of W, neither is
  * data-quadratic. Duplicate right (key, ts): caller pre-aggregates,
  * exactly as the native exec and the window form document.
  */
object AsofBucketed {

  /** left ⟕asof right: for each left row (identified by unique `leftId`)
    * the most recent right row with same `keys` (may be empty = global)
    * and rightTs <= leftTs. Output = left.* ++ rightTs ++ payload (NULL
    * when no match). */
  def asofJoin(left: DataFrame, right: DataFrame, leftId: String,
               keys: Seq[String], leftTs: String, rightTs: String,
               payload: Seq[String], bucketUs: Long): DataFrame = {
    val rk = keys.map(k => s"_rk_$k")
    def keyEq: Column = keys.zip(rk)
      .map { case (k, r) => col(k) === col(r) }
      .foldLeft(lit(true))(_ && _)

    val l = left.withColumn("_b", floor(unix_micros(col(leftTs)) / bucketUs))
    val r = right.select(
      keys.zip(rk).map { case (k, n) => col(k).as(n) } ++
        Seq(floor(unix_micros(col(rightTs)) / bucketUs).as("_rb"),
          struct(col(rightTs).as("_rts") +: payload.map(col): _*).as("_p")): _*)

    // (1) same-bucket: the one join that touches all rows — equi-keyed on
    // (keys, bucket) so hot keys parallelize over time
    val sameBucket = l.select(
        (Seq(col(leftId), col(leftTs), col("_b")) ++ keys.map(col)): _*)
      .join(r, keyEq && col("_rb") === col("_b") &&
        col("_p._rts") <= col(leftTs))
      .groupBy(col(leftId)).agg(max_by(col("_p"), col("_p._rts")).as("_p"))

    // (2) carry: compact right to one row per (key, bucket), then find
    // each left bucket's latest strictly-earlier bucket row — a range
    // join on the COMPACTED tables only
    val lastPerBucket = r.groupBy(col("_rb") +: rk.map(col): _*)
      .agg(max_by(col("_p"), col("_p._rts")).as("_p"))
    val leftBuckets = l.select(col("_b") +: keys.map(col): _*).distinct()
    val carryPerBucket = leftBuckets
      .join(lastPerBucket, keyEq && col("_rb") < col("_b"))
      .groupBy(col("_b") +: keys.map(col): _*)
      .agg(max_by(col("_p"), col("_p._rts")).as("_p"))
    val carry = l.select((Seq(col(leftId), col("_b")) ++ keys.map(col)): _*)
      .join(carryPerBucket, Seq("_b") ++ keys)
      .select(col(leftId), col("_p"))

    // (3) best of both candidate sets per left row, null when neither
    val best = sameBucket.union(carry)
      .groupBy(col(leftId)).agg(max_by(col("_p"), col("_p._rts")).as("_p"))
    left.join(best, Seq(leftId), "left")
      .select(left.columns.map(col) ++
        (col("_p._rts").as(rightTs) +: payload.map(p => col(s"_p.$p").as(p))): _*)
  }
}
