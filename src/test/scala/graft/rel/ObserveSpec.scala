package graft.rel

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Dataset.observe (SURVEY.md §2.11): named accumulator-backed metrics
  * collected DURING a job — the production way to get row counts / null
  * counts / sums for data-quality monitoring without a second pass over
  * the data. The observed values must equal what a separate aggregate
  * query computes. */
class ObserveSpec extends SparkSpec {

  test("observe() collects quality metrics in-flight, matching a second-pass agg") {
    val events = Tables(spark, sf("sf0.001")).events
    val observed = events.observe("quality",
      count(lit(1)).as("n_rows"),
      count(when(col("value").isNull, 1)).as("n_null_value"),
      round(sum(col("value")), 4).as("sum_value"))
    // run any job over the observed frame; metrics ride along and are
    // exposed on that job's QueryExecution after the action completes
    val filtered = observed.filter(col("event_type") === "purchase")
    assert(filtered.collect().nonEmpty)
    val row = filtered.queryExecution.observedMetrics("quality")
    val expected = events.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("value").isNull, 1)).as("n_null_value"),
      round(sum(col("value")), 4).as("sum_value")).head()
    assert(row.getAs[Long]("n_rows") == expected.getAs[Long]("n_rows"))
    assert(row.getAs[Long]("n_null_value") == expected.getAs[Long]("n_null_value"))
    assert(row.getAs[Double]("sum_value") == expected.getAs[Double]("sum_value"))
  }
}
