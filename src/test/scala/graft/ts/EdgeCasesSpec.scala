package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input robustness: every time-series operator must survive
  * empty and single-row inputs (the failure class ADVICE r1 flagged in
  * shingles/sampleFrames — sequence(0, negative) style crashes) — a real
  * corpus always contains an empty partition or a single-event series
  * somewhere in 100 TB. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def empty = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def single = Seq(
    (1L, java.sql.Timestamp.valueOf("2024-01-05 10:30:00"), 7L, "click", 4.2)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("ts operators yield empty results on empty input, no exceptions") {
    val c = TimeSeries.candles(empty, "hour")
    assert(c.count() == 0)
    assert(TimeSeries.candlesFixed(empty, 900).count() == 0)
    assert(TimeSeries.resample(c, 14400).count() == 0)
    assert(TimeSeries.spine(c, 3600).count() == 0)
    assert(TimeSeries.gapDetect(c, 3600).count() == 0)
    assert(TimeSeries.gapFill(c, 3600).count() == 0)
    assert(TimeSeries.vwap(empty, "hour", "value", "value").count() == 0)
    assert(TimeSeries.zscoreOutliers(empty, 3.0).count() == 0)
    assert(TimeSeries.sessionize(empty, 1800).count() == 0)
  }

  test("single-event series: one candle, no gaps, session of one") {
    val c = TimeSeries.candles(single, "hour")
    val row = c.head()
    assert(c.count() == 1)
    assert(row.getAs[Double]("open") == 4.2 && row.getAs[Double]("close") == 4.2)
    assert(row.getAs[Double]("high") == 4.2 && row.getAs[Double]("low") == 4.2)
    assert(TimeSeries.gapDetect(c, 3600).count() == 0)
    assert(TimeSeries.gapFill(c, 3600).count() == 1)
    assert(TimeSeries.sessionize(single, 1800).head().getAs[Long]("session_id") == 1L)
  }

  test("as-of joins (window and native) handle empty right side") {
    val left = single.select($"event_id", $"user_id", $"ts")
    val emptyRight = empty.select($"user_id", $"ts", $"value".as("v"))
    val w = TimeSeries.asofJoin(left, emptyRight, "user_id", "ts", "ts", Seq("v"))
    assert(w.count() == 1 && w.head().isNullAt(w.head().fieldIndex("v")))
    val n = graft.plans.AsofJoinNative.asofJoin(left, emptyRight, "user_id", "ts", "ts", Seq("v"))
    assert(n.count() == 1 && n.head().isNullAt(n.head().fieldIndex("v")))
  }

  test("vwap on a zero-volume bucket yields NULL, not a divide-by-zero error") {
    val zeroVol = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-05 10:30:00"), 7L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val v = TimeSeries.vwap(zeroVol, "hour", "value", "value")
    assert(v.count() == 1 && v.head().isNullAt(v.head().fieldIndex("vwap")))
  }

  test("exact Jaccard of two empty shingle sets is 0, not a crash") {
    import graft.text.TextOps
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text") // < 3 tokens
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val j = TextOps.exactJaccard(pairs, docs, n = 3).head()
    assert(j.getAs[Double]("jaccard") == 0.0)
  }

  test("connected components of an empty pair relation is empty, converges") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.text.TextOps.connectedComponents(pairs).count() == 0)
  }

  test("simhash near-dup pairs: singleton corpus yields no pairs; self-pairs never emitted") {
    import spark.implicits._
    val one = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    assert(graft.text.TextOps.simhashNearDupPairs(one, 2, 30, 1).count() == 0)
    // two identical docs: exactly one (a < b) pair at hd 0
    val two = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = graft.text.TextOps.simhashNearDupPairs(two, 2, 30, 1).collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L && got(0).getLong(1) == 2L
      && got(0).getInt(2) == 0)
  }

  test("zscore on a constant series (stddev 0) yields no outliers, no NaN crash") {
    val const = Seq.tabulate(5)(i =>
      (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-05 10:0$i:00"), 7L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(TimeSeries.zscoreOutliers(const, 3.0).count() == 0)
  }
}
