package graft.ts

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference warehouse's update lifecycle (SURVEY.md §3.1 #2),
  * Spark-native: a candle store is a parquet dataset partitioned by
  * series; `update` aggregates only events in buckets at-or-after the
  * stored high-water mark and overwrites just those partitions-in-time
  * (reference v0 snapshot is empty; semantics per SURVEY.md §1.4).
  *
  * Scale notes: the high-water-mark read is a metadata-cheap max() over
  * the bucket column; the incremental aggregation scans only events with
  * ts ≥ mark (pushed to the scan — see Tables.eventsRange for the
  * pushdown idiom), and the rewrite touches one tail bucket per series,
  * not the history. Append-mostly streams make this O(new data), which is
  * the property that matters when the store holds years of candles.
  */
object Incremental {

  /** Full rebuild: candles for all events → overwrite the store. */
  def rebuild(events: DataFrame, storePath: String, unit: String = "hour"): Unit =
    TimeSeries.candles(events, unit)
      .write.mode(SaveMode.Overwrite).parquet(storePath)

  /** Incremental update: re-aggregate only buckets ≥ the stored
    * high-water mark (the mark bucket itself is recomputed — it may have
    * been partial at last update) and splice them over the store tail. */
  def update(spark: SparkSession, events: DataFrame, storePath: String,
             unit: String = "hour"): Unit = {
    val existing =
      try Some(spark.read.parquet(storePath)) catch { case _: Exception => None }
    existing match {
      case None => rebuild(events, storePath, unit)
      case Some(store) =>
        val mark = store.agg(max(col("bucket"))).head().getTimestamp(0)
        val fresh = TimeSeries.candles(
          events.filter(date_trunc(unit, col("ts")) >= lit(mark)), unit)
        val keep = store.filter(col("bucket") < lit(mark))
        // write via a temp dir: the new tail reads from the store being replaced
        val tmp = storePath + "_tmp"
        keep.unionByName(fresh).write.mode(SaveMode.Overwrite).parquet(tmp)
        spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(storePath)
    }
  }
}
