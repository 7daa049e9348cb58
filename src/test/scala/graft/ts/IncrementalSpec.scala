package graft.ts

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  test("two-step incremental update equals full rebuild") {
    val events = graft.Tables(spark, sf("sf0.001")).events
    val cut = "2024-01-15 00:00:00"

    // build from the first half, then update with the full stream
    val store = Files.createTempDirectory("graft_store").toString + "/candles"
    Incremental.update(spark, events.filter(col("ts") < lit(cut).cast("timestamp")), store)
    val partial = spark.read.parquet(store).count()
    Incremental.update(spark, events, store)

    val got = spark.read.parquet(store)
      .orderBy("series", "bucket").collect()

    val full = Files.createTempDirectory("graft_full").toString + "/candles"
    Incremental.rebuild(events, full)
    val exp = spark.read.parquet(full)
      .orderBy("series", "bucket").collect()

    assert(partial > 0 && got.length > partial)
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (g, e) => assert(g == e) }
  }
}
