package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState running counts: streaming totals equal batch counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val counts = StatefulOps.runningCountsByKey(input.toDF().withColumnRenamed("value", "user_id"), "user_id")
      .toDF("user_id", "n")
    val q = counts.writeStream.format("memory").queryName("fmgws_counts")
      .outputMode("update")
      .option("checkpointLocation",
        s"/dev/shm/graft-ckpt/fmgws_test_${java.util.UUID.randomUUID().toString.take(8)}")
      .start()
    try {
      input.addData(1L, 1L, 2L)
      q.processAllAvailable()
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
    } finally q.stop()
    // last update per key = total count across both micro-batches
    val last = spark.table("fmgws_counts")
      .groupBy("user_id").agg(max("n").as("n"))
      .orderBy("user_id").as[(Long, Long)].collect().toSeq
    assert(last == Seq((1L, 3L), (2L, 2L), (3L, 1L)))
  }

  test("batch application equals plain groupBy count") {
    val df = Seq(5L, 5L, 6L).toDF("user_id")
    val got = StatefulOps.runningCountsByKey(df, "user_id").collect().toMap
    assert(got == Map(5L -> 2L, 6L -> 1L))
  }

  test("transformWithState EMA: streaming recurrence equals hand-computed, state survives batches") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state-store provider
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Long, Double)] // (series, epoch µs, value)
      val ema = StatefulOps.emaBySeries(
        input.toDF().toDF("event_type", "us", "value")
          .withColumn("ts", timestamp_micros(col("us"))).drop("us"),
        alpha = 0.5)
      val q = ema.toDF("series", "ts_us", "ema")
        .writeStream.format("memory").queryName("tws_ema").outputMode("update")
        .option("checkpointLocation",
          s"/dev/shm/graft-ckpt/tws_${java.util.UUID.randomUUID().toString.take(8)}")
        .start()
      try {
        input.addData(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 1L, 100.0))
        q.processAllAvailable()
        input.addData(("a", 3L, 30.0)) // continues from batch-1 state
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.table("tws_ema")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // a: 10 → .5*20+.5*10=15 → .5*30+.5*15=22.5 (state crossed batches)
      assert(got(("a", 1L)) == 10.0 && got(("a", 2L)) == 15.0)
      assert(got(("a", 3L)) == 22.5, s"state must survive micro-batches: $got")
      assert(got(("b", 1L)) == 100.0)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
