package graft.ts

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IncrementalSpec extends SparkSpec {

  private def dataFiles(store: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(store))
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified())
      .toMap
  }

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

  test("update rewrites only tail day-partitions, never history files") {
    val events = graft.Tables(spark, sf("sf0.001")).events
    val cut = "2024-01-15 00:00:00"

    val store = Files.createTempDirectory("graft_store2").toString + "/candles"
    Incremental.update(spark, events.filter(col("ts") < lit(cut).cast("timestamp")), store)

    // history = every day-partition strictly before the high-water day
    val markDay = spark.read.parquet(store)
      .agg(max(to_date(col("bucket")))).head().getDate(0).toString
    val before = dataFiles(store).filter { case (p, _) => !p.contains(s"pdate=$markDay") }
    assert(before.nonEmpty, "fixture should span multiple days")

    Incremental.update(spark, events, store)

    val after = dataFiles(store)
    // every pre-existing history file still present, byte-for-byte untouched
    before.foreach { case (path, mtime) =>
      assert(after.contains(path), s"history file rewritten or removed: $path")
      assert(after(path) == mtime, s"history file modified: $path")
    }
  }

  test("update on an existing-but-empty store rebuilds instead of wiping") {
    val events = graft.Tables(spark, sf("sf0.001")).events
    val store = Files.createTempDirectory("graft_store3").toString + "/candles"

    // a store with a readable schema but zero rows → null high-water mark
    val schema = StructType(Seq(
      StructField("bucket", TimestampType), StructField("series", StringType),
      StructField("open", DoubleType), StructField("high", DoubleType),
      StructField("low", DoubleType), StructField("close", DoubleType),
      StructField("volume", DoubleType), StructField("trades", LongType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.parquet(store)

    Incremental.update(spark, events, store)

    val full = Files.createTempDirectory("graft_full3").toString + "/candles"
    Incremental.rebuild(events, full)
    assert(spark.read.parquet(store).count() == spark.read.parquet(full).count())
    assert(spark.read.parquet(store).count() > 0)
  }
}
