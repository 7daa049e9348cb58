package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability (SURVEY.md §2.9): progress events are how a
  * production stream is monitored (rows/s, batch durations, state size).
  * Pins that (a) StreamingQueryListener receives start/progress/
  * terminate callbacks, and (b) the per-batch numInputRows across all
  * progress events sums to exactly the input row count — the metric a
  * lag/throughput alert is built on. */
class ProgressMetricsSpec extends SparkSpec {

  test("listener progress events account for every input row exactly once") {
    val events = graft.Tables(spark, sf("sf0.001")).events
      .select(col("event_id"), col("event_type"))
    val total = events.count()
    val srcDir = Files.createTempDirectory("pm_src").toString
    events.repartition(4).write.mode("overwrite").parquet(srcDir)

    val progressRows = new ConcurrentLinkedQueue[Long]()
    @volatile var started = false
    @volatile var terminated = false
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        started = true
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        progressRows.add(e.progress.numInputRows)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        terminated = true
    }
    spark.streams.addListener(listener)
    try {
      val q = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .writeStream.format("memory").queryName("pm_sink").outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("pm_ckpt").toString)
        .start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(30000)
      // listener bus is async; give it a bounded moment to drain
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while ((!terminated ||
        progressRows.asScala.sum < total) && System.nanoTime() < deadline)
        Thread.sleep(50)

      assert(started, "onQueryStarted never fired")
      assert(terminated, "onQueryTerminated never fired")
      val counted = progressRows.asScala.sum
      assert(counted == total,
        s"progress accounted $counted rows, input had $total")
      assert(progressRows.asScala.count(_ > 0) >= 2,
        "expected multiple non-empty micro-batches under maxFilesPerTrigger=1")
      assert(spark.table("pm_sink").count() == total)
    } finally spark.streams.removeListener(listener)
  }

  private implicit class QueueOps(q: ConcurrentLinkedQueue[Long]) {
    def asScala: Seq[Long] = {
      val b = Seq.newBuilder[Long]
      q.forEach(v => b += v)
      b.result()
    }
  }
}
