package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val trades = Seq(
    // series A, hour 10: open=5 (earliest), high=9, low=2, close=2 (latest)
    ("A", ts("2024-01-01 10:00:01"), 5.0, 1L),
    ("A", ts("2024-01-01 10:20:00"), 9.0, 2L),
    ("A", ts("2024-01-01 10:40:00"), 2.0, 3L),
    // series A, hour 12 (hour 11 is a gap)
    ("A", ts("2024-01-01 12:30:00"), 7.0, 4L),
    // series B, single row
    ("B", ts("2024-01-01 10:05:00"), 4.0, 5L)
  ).toDF("event_type", "ts", "value", "event_id")

  test("candles: OHLCV invariants on golden input") {
    val c = TimeSeries.candles(trades, "hour").orderBy("series", "bucket").collect()
    assert(c.length == 3)
    val a10 = c(0)
    assert(a10.getAs[String]("series") == "A")
    assert(a10.getAs[Double]("open") == 5.0)
    assert(a10.getAs[Double]("high") == 9.0)
    assert(a10.getAs[Double]("low") == 2.0)
    assert(a10.getAs[Double]("close") == 2.0)
    assert(a10.getAs[Double]("volume") == 16.0)
    assert(a10.getAs[Long]("trades") == 3L)
    c.foreach { r =>
      assert(r.getAs[Double]("low") <= math.min(r.getAs[Double]("open"), r.getAs[Double]("close")))
      assert(r.getAs[Double]("high") >= math.max(r.getAs[Double]("open"), r.getAs[Double]("close")))
    }
  }

  test("resample: 1h→4h equals candles computed directly at 4h") {
    val events = graft.Tables(spark, sf("sf0.001")).events
    val direct = TimeSeries.candlesFixed(events, 14400)
      .orderBy("bucket", "series").collect()
    val resampled = TimeSeries.resample(TimeSeries.candles(events, "hour"), 14400)
      .orderBy("bucket", "series").collect()
    assert(direct.length == resampled.length)
    direct.zip(resampled).foreach { case (d, r) =>
      assert(d.getAs[java.sql.Timestamp]("bucket") == r.getAs[java.sql.Timestamp]("bucket"))
      assert(d.getAs[Double]("open") == r.getAs[Double]("open"))
      assert(d.getAs[Double]("close") == r.getAs[Double]("close"))
      assert(d.getAs[Double]("high") == r.getAs[Double]("high"))
      assert(d.getAs[Double]("low") == r.getAs[Double]("low"))
      assert(math.abs(d.getAs[Double]("volume") - r.getAs[Double]("volume")) < 1e-9)
    }
  }

  test("gap detection finds the hour-11 gap and nothing else") {
    val gaps = TimeSeries.gapDetect(TimeSeries.candles(trades, "hour"), 3600).collect()
    assert(gaps.length == 1)
    assert(gaps(0).getAs[String]("series") == "A")
    assert(gaps(0).getAs[java.sql.Timestamp]("bucket") == ts("2024-01-01 11:00:00"))
  }

  test("gap fill: spine-complete, forward-filled close, zero volume on gaps") {
    val filled = TimeSeries.gapFill(TimeSeries.candles(trades, "hour"), 3600)
      .orderBy("series", "bucket").collect()
    assert(filled.length == 4) // A:10,11,12 + B:10
    val a11 = filled(1)
    assert(a11.getAs[Boolean]("was_gap"))
    assert(a11.getAs[Double]("close_filled") == 2.0) // carried from hour 10
    assert(a11.getAs[Double]("volume") == 0.0)
  }

  test("as-of join matches brute force on fixture events") {
    val ev = graft.Tables(spark, sf("sf0.001")).events
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value".as("purchase_value"))
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"value").as("click_value"))
    val got = TimeSeries.asofJoin(purchases, clicks, "user_id", "ts", "ts", Seq("click_value"))
      .orderBy("event_id").collect()
    // brute force: per purchase, max-ts click with ts <= purchase.ts
    val cl = clicks.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val exp = purchases.orderBy("event_id").collect().map { p =>
      val cands = cl.filter(c => c._1 == p.getLong(1) && !c._2.after(p.getTimestamp(2)))
      if (cands.isEmpty) null else cands.maxBy(_._2.getTime)._3
    }
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (g, e) =>
      val gv = if (g.isNullAt(g.fieldIndex("click_value"))) null
               else g.getAs[Double]("click_value").asInstanceOf[AnyRef]
      assert(gv == e, s"event ${g.getAs[Long]("event_id")}")
    }
  }

  test("sessionize: splits at gaps > threshold only") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (2L, ts("2024-01-01 10:10:00"), 100L), // same session (10 min)
      (3L, ts("2024-01-01 11:00:00"), 100L), // new session (50 min > 30)
      (4L, ts("2024-01-01 09:00:00"), 200L)  // other user
    ).toDF("event_id", "ts", "user_id")
    val s = TimeSeries.sessionize(ev, 1800).orderBy("event_id").collect()
    assert(s(0).getAs[Long]("session_id") == 1L)
    assert(s(1).getAs[Long]("session_id") == 1L)
    assert(s(2).getAs[Long]("session_id") == 2L)
    assert(s(3).getAs[Long]("session_id") == 1L)
  }
}
