package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Restart twin of ExactlyOnceSpec for the foreachBatch upsert pattern
  * (the streaming_foreachbatch_upsert graded query): an update-mode agg
  * whose per-batch deltas land via foreachBatch, stopped mid-stream and
  * restarted from the checkpoint, must CONVERGE — the last write per key
  * equals the full-history aggregate. Replayed batches may append
  * duplicate delta rows (parquet append is not transactional); the merge
  * (max batch_id per key, rows within a replayed batch are identical) is
  * what makes the read-back idempotent.
  */
class ForeachBatchRestartSpec extends SparkSpec {

  test("foreachBatch upsert converges across a mid-stream restart") {
    val events = graft.Tables(spark, sf("sf0.001")).events
      .select(col("ts"), col("event_type"), col("value"))

    val srcDir = Files.createTempDirectory("fb_src").toString
    events.repartition(4).write.mode("overwrite").parquet(srcDir)
    val outDir = Files.createTempDirectory("fb_out").toString + "/out"
    val ckpt = Files.createTempDirectory("fb_ckpt").toString

    val schema = events.schema
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("v"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .start()

    // phase 1: land at least one delta batch, then stop mid-stream
    val q1 = start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (q1.recentProgress.length < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally q1.stop()

    // phase 2: restart from the checkpoint and drain the rest
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"), col("event_type"))
      .orderBy(col("batch_id").desc)
    val merged = spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("bucket"), col("event_type"), col("n"), col("v"))
      .orderBy("bucket", "event_type")
      .collect().toSeq

    val expected = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("v"))
      .orderBy("bucket", "event_type")
      .collect().toSeq

    assert(merged == expected,
      s"merged state diverged: ${merged.size} vs ${expected.size} keys")
  }
}
