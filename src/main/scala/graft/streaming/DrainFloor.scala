package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drain-floor calibration (VERDICT r6 ask #7): time a micro-batch drain
  * whose input is ONE trivial row, so the state-store commit + offset-log
  * + memory-sink floor can be separated from plan cost when reading the
  * 21 streaming entries in BENCH_r*.json. Prints three rows: stateless
  * passthrough, stateful agg at 4 partitions (the graded drains'
  * setting), stateful agg at 32 partitions (what NOT sizing the state
  * partition count would cost). Recorded in BASELINE.md.
  */
object DrainFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val in = java.nio.file.Files.createTempDirectory("drain-floor").toString
    spark.range(1).selectExpr("id", "timestamp_micros(id) AS ts")
      .write.mode("overwrite").parquet(in)

    def drainOnce(partitions: Int, stateful: Boolean): Double = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      try {
        val name = s"floor_${partitions}_${stateful}_${System.nanoTime()}"
        val src = spark.readStream
          .schema("id LONG, ts TIMESTAMP").parquet(in)
        val df = if (stateful)
          src.groupBy(window(col("ts"), "1 hour")).count()
        else src.select(col("id"))
        val t0 = System.nanoTime()
        val q = df.writeStream.format("memory").queryName(name)
          .outputMode(if (stateful) "complete" else "append")
          .option("checkpointLocation",
            s"/dev/shm/graft-ckpt/floor_${java.util.UUID.randomUUID().toString.take(8)}")
          .start()
        q.processAllAvailable()
        q.stop()
        (System.nanoTime() - t0) / 1e9
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    for ((label, parts, stateful) <- Seq(
        ("stateless passthrough, 4 partitions", 4, false),
        ("stateful windowed agg, 1 partition (join setting)", 1, true),
        ("stateful windowed agg, 2 partitions (graded default)", 2, true),
        ("stateful windowed agg, 4 partitions (session family)", 4, true),
        ("stateful windowed agg, 32 partitions", 32, true))) {
      val runs = (1 to 4).map(_ => drainOnce(parts, stateful)).sorted
      println(f"[floor] $label%-52s median ${runs(runs.length / 2)}%5.2f s")
    }
    spark.stop()
  }
}
