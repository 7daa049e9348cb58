package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Scan-level efficiency guards: at 100 TB the difference between a
  * pruned and an unpruned parquet scan IS the query cost, so the two
  * properties the plan audit checks by hand are pinned here:
  * (1) column pruning — a 2-column aggregate must not read the 16-column
  * table; (2) predicate pushdown — the events time-range scan must reach
  * the parquet row-group stats with its range predicate (the reason
  * Tables.eventsRange filters the RAW nanos column before the µs
  * conversion). */
class ScanPruningSpec extends SparkSpec {

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: FileSourceScanExec => s }
  }

  test("column pruning: lineitem aggregate reads only the referenced columns") {
    val df = Tables(spark, sf("sf0.001")).lineitem
      .groupBy(col("l_returnflag")).agg(round(sum(col("l_quantity")), 4).as("q"))
    val scan = scans(df).head
    val read = scan.requiredSchema.fieldNames.toSet
    assert(read == Set("l_returnflag", "l_quantity"),
      s"scan reads $read — column pruning regressed")
  }

  test("predicate pushdown: eventsRange reaches parquet row-group stats") {
    val df = Tables(spark, sf("sf0.001")).eventsRange("2024-01-02", "2024-01-03")
      .select(col("event_id"))
    val scan = scans(df).head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
      s"range predicate not pushed: PushedFilters=$pushed")
  }

  test("generation-aware control: pushdown through the CONVERTED ts column") {
    // documents WHY eventsRange exists per fixture generation: the nanos
    // generation's timestamp_micros(raw div 1000) arithmetic is opaque to
    // the parquet reader (filter must hit the raw column), while the
    // round-8 µs generation's NTZ→TIMESTAMP cast IS unwrapped by Catalyst
    // — pushdown works either way through eventsRange, and through the
    // converted column only on the µs generation.
    val t = Tables(spark, sf("sf0.001"))
    val converted = t.events
      .filter(col("ts") >= lit("2024-01-02").cast("timestamp") &&
        col("ts") < lit("2024-01-03").cast("timestamp"))
      .select(col("event_id"))
    val pushed = scans(converted).head.metadata.getOrElse("PushedFilters", "")
    import org.apache.spark.sql.types.LongType
    val nanosGen = spark.read
      .parquet(sf("sf0.001") + "/events.parquet").schema("ts").dataType == LongType
    if (nanosGen)
      assert(!pushed.contains("GreaterThanOrEqual(ts"),
        s"unexpected pushdown through the nanos conversion: $pushed — " +
          "if Spark learned this rewrite, eventsRange can be simplified")
    else
      assert(pushed.contains("GreaterThanOrEqual(ts"),
        s"cast no longer unwrapped — µs-generation pushdown lost: $pushed")
  }
}
