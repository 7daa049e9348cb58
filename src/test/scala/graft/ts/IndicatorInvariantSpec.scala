package graft.ts

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Mathematical invariants of the round-5 indicator family, asserted on
  * the sf0.001 fixture — the oracle hash-match proves cross-engine
  * equality, these prove the numbers MEAN what the indicator claims
  * (a matching pair of wrong implementations would pass the oracle). */
class IndicatorInvariantSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf("sf0.001"))

  test("RSI lies in [0, 1000] permille (or the -1 degenerate marker)") {
    val bad = run("rsi_cutler_14")
      .filter(!(col("rsi_permille").between(0, 1000) || col("rsi_permille") === -1))
    assert(bad.count() == 0)
  }

  test("stochastic %K in [0, 1000]; %D sum consistent with 3 %K taps") {
    val df = run("stochastic_14_3")
    assert(df.filter(!(col("k_permille").between(0, 1000)
      || col("k_permille") === -1)).count() == 0)
    assert(df.filter(!col("d_x3_permille").between(-3, 3000)).count() == 0)
  }

  test("max drawdown is a permyriad in [0, 10000] and peak is positive") {
    val df = run("max_drawdown")
    assert(df.filter(!col("max_dd_permyriad").between(0, 10000)).count() == 0)
    assert(df.filter(col("peak_cents") <= 0).count() == 0)
  }

  test("Donchian channel is ordered and the flag matches the band") {
    val df = run("donchian_breakout_20")
    assert(df.filter(col("lower_cents") > col("upper_cents")).count() == 0)
    assert(df.filter(!col("breakout").isin(-1, 0, 1)).count() == 0)
  }

  test("OBV of a single-delta prefix equals the signed second value") {
    // first row per series always has obv 0 (no delta defined)
    val firsts = run("obv_running")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("event_id"))))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("obv_cents") =!= 0).count() == 0)
  }

  test("TEMA of a constant series equals the constant (x 2097152 cents)") {
    import spark.implicits._
    // 30 equal values => every EMA layer returns the constant, TEMA too
    val const = Seq.tabulate(30)(i => (i.toLong, "s", 7.00 + 0.0, i))
      .map { case (id, s, v, i) => (id, new java.sql.Timestamp(1700000000000L + i * 60000L), s, v) }
      .toDF("event_id", "ts", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"))
    val weights = Seq(64L, 32L, 16L, 8L, 4L, 2L, 1L, 1L)
    def conv(c: org.apache.spark.sql.Column) =
      weights.zipWithIndex.map { case (wt, k) =>
        (if (k == 0) c else lag(c, k).over(w)) * lit(wt) }.reduce(_ + _)
    val vc = round(col("value") * 100).cast("long")
    val tema = const
      .withColumn("ema1", when(lag(vc, 7).over(w).isNotNull, conv(vc)))
      .withColumn("ema2", conv(col("ema1")))
      .withColumn("ema3", conv(col("ema2")))
      .withColumn("tema", col("ema1") * lit(3L * 16384L) - col("ema2") * lit(3L * 128L) + col("ema3"))
      .filter(col("tema").isNotNull)
    assert(tema.count() > 0)
    assert(tema.filter(col("tema") =!= 700L * 2097152L).count() == 0)
  }

  test("autocorrelation is a correlation: |acf1| <= 1") {
    val df = run("autocorr_lag1")
    assert(df.filter(abs(col("acf1")) > 1.0).count() == 0)
  }

  test("percentile bands: lower <= upper, outliers bounded by ~q fractions") {
    val df = run("hourly_percentile_bands")
    assert(df.filter(col("p05_cents") > col("p95_cents")).count() == 0)
    // strictly-below-the-5th-order-stat count can never reach ceil(q n)
    assert(df.filter(col("n_below") >= ceil(col("n") * 0.05) + 1).count() == 0)
  }
}
