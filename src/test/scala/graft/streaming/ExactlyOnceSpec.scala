package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exactly-once file sink (SURVEY.md §2.9): a checkpointed
  * writeStream→parquet run that is STOPPED mid-stream and restarted must
  * produce every input row exactly once — the checkpoint (source offsets
  * + sink commit log) is what makes the parquet sink transactional
  * across restarts. */
class ExactlyOnceSpec extends SparkSpec {

  test("parquet sink + checkpoint: stop/restart yields each row exactly once") {
    val events = graft.Tables(spark, sf("sf0.001")).events
      .select(col("event_id"), col("event_type"), col("value"))
    val total = events.count()

    // lay the input out as several files so the stream takes several
    // micro-batches (maxFilesPerTrigger=1) and can be interrupted between
    val srcDir = Files.createTempDirectory("eo_src").toString
    events.repartition(4).write.mode("overwrite").parquet(srcDir)
    val outDir = Files.createTempDirectory("eo_out").toString + "/out"
    val ckpt = Files.createTempDirectory("eo_ckpt").toString

    val schema = events.schema
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .start()

    // phase 1: process at least one batch, then stop mid-stream
    val q1 = start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (q1.recentProgress.length < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally q1.stop()
    val afterStop = spark.read.parquet(outDir).count()

    // phase 2: restart from the checkpoint and drain the rest
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == total,
      s"rows out=${out.count()} in=$total (afterStop=$afterStop)")
    assert(out.select("event_id").distinct().count() == total,
      "restart must not duplicate rows")
  }
}
