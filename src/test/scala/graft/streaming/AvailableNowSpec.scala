package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Trigger.AvailableNow (SURVEY.md §2.9): the production "drain what
  * exists, then stop" trigger — a checkpointed streaming job that runs as
  * a bounded batch (respecting maxFilesPerTrigger pacing) and TERMINATES
  * on its own, unlike processAllAvailable which needs the caller to stop
  * the query. Two properties pinned: (1) one AvailableNow run processes
  * exactly the input present at start, in multiple micro-batches;
  * (2) a second run over the same checkpoint after new files arrive
  * processes ONLY the new files — the scheduled-incremental-job pattern
  * (hourly cron over a growing directory) with exactly-once output. */
class AvailableNowSpec extends SparkSpec {

  test("AvailableNow drains current input, terminates, and resumes incrementally") {
    val events = graft.Tables(spark, sf("sf0.001")).events
      .select(col("event_id"), col("event_type"), col("value"))
    val total = events.count()

    val srcDir = Files.createTempDirectory("an_src").toString
    events.filter(col("event_id") % 2 === 0)
      .repartition(3).write.mode("overwrite").parquet(srcDir)
    val firstHalf = spark.read.parquet(srcDir).count()
    val outDir = Files.createTempDirectory("an_out").toString + "/out"
    val ckpt = Files.createTempDirectory("an_ckpt").toString

    val schema = events.schema
    def runOnce(): Int = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
      q.recentProgress.count(_.numInputRows > 0)
    }

    val batches1 = runOnce()
    assert(batches1 >= 2, s"expected multiple paced micro-batches, got $batches1")
    assert(spark.read.parquet(outDir).count() == firstHalf)

    // new files land; the same checkpoint resumes and processes only them
    events.filter(col("event_id") % 2 === 1)
      .repartition(2).write.mode("append").parquet(srcDir)
    runOnce()
    val out = spark.read.parquet(outDir)
    assert(out.count() == total, s"rows out=${out.count()} in=$total")
    assert(out.select("event_id").distinct().count() == total,
      "incremental resume must not duplicate rows")
  }
}
