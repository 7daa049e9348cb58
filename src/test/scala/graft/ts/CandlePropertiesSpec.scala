package graft.ts

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests promised in SURVEY.md §5: candle invariants, resample
  * idempotence, gap-fill spine completeness, dedup idempotence — over
  * ScalaCheck-generated random trade streams (seeded sampling; the
  * scalatest+scalacheck bridge artifact isn't on the offline classpath). */
class CandlePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val tradeGen: Gen[List[(String, Long, Double)]] = for {
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      series <- Gen.oneOf("A", "B", "C")
      // µs offsets across ~6 hours from a fixed origin
      offUs <- Gen.choose(0L, 6L * 3600L * 1000000L)
      value <- Gen.choose(-1000.0, 1000.0)
    } yield (series, 1704100000000000L + offUs, value))
  } yield rows

  private def toDf(rows: List[(String, Long, Double)]) =
    rows.zipWithIndex
      .map { case ((s, us, v), i) => (s, new java.sql.Timestamp(us / 1000L), v, i.toLong) }
      .toDF("event_type", "ts", "value", "event_id")

  test("candle invariants: low <= open,close <= high; volume = sum; trades = count") {
    samples(tradeGen, 8).foreach { rows =>
      val byGroup = rows.groupBy { case (s, us, _) => (s, us / 3600000000L) }
      val candles = TimeSeries.candles(toDf(rows), "hour").collect()
      assert(candles.length == byGroup.size)
      candles.foreach { c =>
        val lo = c.getAs[Double]("low"); val hi = c.getAs[Double]("high")
        assert(lo <= math.min(c.getAs[Double]("open"), c.getAs[Double]("close")))
        assert(hi >= math.max(c.getAs[Double]("open"), c.getAs[Double]("close")))
      }
      val volume = candles.map(_.getAs[Double]("volume")).sum
      assert(math.abs(volume - rows.map(_._3).sum) < 1e-6)
      assert(candles.map(_.getAs[Long]("trades")).sum == rows.length)
    }
  }

  test("resample composition: (1h candles -> 4h) == events -> 4h directly") {
    samples(tradeGen, 4).foreach { rows =>
      val df = toDf(rows)
      val viaHour = TimeSeries.resample(TimeSeries.candles(df, "hour"), 14400)
        .orderBy("series", "bucket").collect()
      val direct = TimeSeries.candlesFixed(df, 14400)
        .orderBy("series", "bucket").collect()
      assert(viaHour.length == direct.length)
      viaHour.zip(direct).foreach { case (a, b) =>
        assert(a.getAs[Double]("open") == b.getAs[Double]("open"))
        assert(a.getAs[Double]("close") == b.getAs[Double]("close"))
        assert(a.getAs[Double]("high") == b.getAs[Double]("high"))
        assert(a.getAs[Double]("low") == b.getAs[Double]("low"))
        assert(math.abs(a.getAs[Double]("volume") - b.getAs[Double]("volume")) < 1e-6)
      }
    }
  }

  test("gap fill covers the spine exactly; first bucket always filled") {
    samples(tradeGen, 4).foreach { rows =>
      val candles = TimeSeries.candles(toDf(rows), "hour")
      val spine = TimeSeries.spine(candles, 3600).count()
      val filled = TimeSeries.gapFill(candles, 3600)
      assert(filled.count() == spine)
      assert(filled.filter("close_filled IS NULL").count() == 0)
    }
  }

  test("exact dedup is idempotent") {
    samples(Gen.nonEmptyListOf(Gen.oneOf("a b c", "x y", "a b c", "q")), 8).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = docs.dropDuplicates("text")
      assert(once.dropDuplicates("text").count() == once.count())
      assert(once.count() == texts.distinct.length)
    }
  }
}
