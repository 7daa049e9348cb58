package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  test("partitioned write: layout on disk + partition pruning on read") {
    val out = Files.createTempDirectory("graft_part").toString
    val events = graft.Tables(spark, sf("sf0.001")).events
    Sinks.writePartitioned(events, out, Seq("event_type"))

    // physical layout: one directory per partition value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("event_type=")))
    assert(dirs.length == 5)

    // pruning: a partition-key filter must reach the scan as a partition
    // filter, not a data filter
    val read = spark.read.parquet(out).filter(col("event_type") === "click")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
    val expected = events.filter(col("event_type") === "click").count()
    assert(read.count() == expected)
  }

  test("csv sink round-trips the candle serving shape") {
    val out = Files.createTempDirectory("graft_csv").toString
    val candles = graft.SparkEntry.queries("candles_1h")(spark, sf("sf0.001"))
    Sinks.writeCsv(candles, out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == candles.count())
    assert(back.columns.toSeq == candles.columns.toSeq)
  }
}
