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
}
