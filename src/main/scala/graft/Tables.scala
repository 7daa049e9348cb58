package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy handles to the warehouse's base tables (one parquet dataset each).
  *
  * Schemas per FIXTURES.md (driver-generated; reference v0 snapshot is
  * empty, see SURVEY.md §0). At 100 TB these would be directory-partitioned
  * datasets (e.g. events partitioned by date) — the read path is identical:
  * `spark.read.parquet(dir)` + Catalyst partition pruning. Filters written
  * against `ts`/key columns push down to parquet row-group stats either way.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. All fixture values are µs-aligned (verified: 0 rows with
    * sub-µs nanos), so read nanos as long and convert exactly. The conf is
    * set lazily here so it also holds on the driver-provided session used
    * by SparkEntry.entry. */
  private def withNanosTs(name: String, tsCol: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.expr
    // integer `div`, not `/`: ns-epoch values exceed double's 53-bit mantissa
    t(name).withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
  }

  /** The tsdb core read path: time-range scan over events with the range
    * predicate applied to the RAW nanos column, BEFORE the µs conversion —
    * a filter on the converted column is opaque to parquet pushdown
    * (PushedFilters shows only IsNotNull), while this formulation reaches
    * the row-group stats. `from`/`until` are "yyyy-MM-dd[ HH:mm:ss]" UTC,
    * half-open. */
  def eventsRange(from: String, until: String): DataFrame = {
    def nanos(s: String): Long = {
      val norm = if (s.length == 10) s + " 00:00:00" else s
      java.time.LocalDateTime
        .parse(norm.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
        .toEpochMilli * 1000000L
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr}
    t("events")
      .filter(col("ts") >= nanos(from) && col("ts") < nanos(until))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = withNanosTs("events", "ts")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
