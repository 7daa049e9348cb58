package graft.streaming

import graft.SparkSpec
import graft.ts.TimeSeries

class StreamingSpec extends SparkSpec {

  test("streaming candles equal batch candles on the same fixture") {
    val dir = sf("sf0.001")
    val streamed = graft.SparkEntry.queries("streaming_candles_1h")(spark, dir)
      .collect()
    val batch = graft.SparkEntry.queries("candles_1h")(spark, dir)
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("streaming dedup keeps one row per key") {
    val dir = sf("sf0.001")
    val got = graft.SparkEntry.queries("streaming_dedup_counts")(spark, dir).collect()
    val events = graft.Tables(spark, dir).events
    val exp = events.groupBy("event_type").count()
      .orderBy("event_type").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      exp.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }
}
