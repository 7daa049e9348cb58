package graft.ts

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Property guards for the round-10 statistics family — each test checks
  * an invariant the DuckDB hash-match cannot see (the oracle mirrors the
  * algorithm, so a shared algorithmic slip would hash-match; these pin
  * the MATH against independent derivations).
  */
class Round10StatsSpec extends SparkSpec {

  private def q(name: String, dir: String = "sf0.001") =
    SparkEntry.queries(name)(spark, sf(dir)).collect()

  test("kaplan_meier: survival is monotone non-increasing, at-risk strictly decreasing") {
    val rows = q("kaplan_meier_conversion").map(r =>
      (r.getAs[Long]("dur_h"), r.getAs[Long]("at_risk"), r.getAs[Long]("ln_surv_um")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { case Array((_, ar1, s1), (_, ar2, s2)) =>
      assert(s2 <= s1, "log-survival must be non-increasing")
      assert(ar2 < ar1, "at-risk must strictly decrease between event steps")
    case _ => ()
    }
    assert(rows.forall(_._3 <= 0), "log-survival is a sum of negative-log terms")
  }

  test("logrank: O1 bounded by KM total conversions; variance and chi2 sane") {
    val km = q("kaplan_meier_conversion")
    val totalConv = km.map(_.getAs[Long]("d_conv")).sum
    val lr = q("logrank_test_conversion").head
    assert(lr.getAs[Long]("o1") <= totalConv, "arm-0 conversions are a subset")
    assert(lr.getAs[Long]("v1_um") > 0)
    assert(lr.getAs[Long]("chi2_um") >= 0)
  }

  test("ks_two_sample: matches a brute-force ECDF sup computed test-side") {
    val vals = Tables(spark, sf("sf0.001")).events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val p = vals.filter(_._1 == "purchase").map(_._2).sorted
    val k = vals.filter(_._1 == "click").map(_._2).sorted
    val dBrute = (p ++ k).distinct.map { v =>
      val c1 = p.count(_ <= v).toLong; val c2 = k.count(_ <= v).toLong
      math.abs(c1 * k.length - c2 * p.length)
    }.max
    val row = q("ks_two_sample").head
    assert(row.getAs[Long]("d_num") == dBrute)
    assert(row.getAs[Long]("n1") == p.length && row.getAs[Long]("n2") == k.length)
  }

  test("forecast_hw_mae: the codegen fold equals a plain Scala reference recurrence") {
    def sdiv2(x: Long) = if (x >= 0) x / 2 else -((-x) / 2)
    val eh = Tables(spark, sf("sf0.001")).events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val lo = eh.map(_._2).min; val hi = eh.map(_._2).max
    val out = q("forecast_hw_mae")
    assert(out.nonEmpty)
    for (row <- out) {
      val t = row.getAs[String]("event_type")
      val byHour = eh.filter(_._1 == t).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val seq = (lo to hi).map(h => byHour.getOrElse(h, 0L) * 1000L).toArray
      assert(seq.length == row.getAs[Int]("n_hours"))
      var l = seq.take(24).sum / 24
      var b = 0L
      val s = Array.tabulate(24)(i => seq(i) - l)
      for (tt <- 25 to seq.length - 24) {
        val y = seq(tt - 1)
        val lN = sdiv2((y - s(0)) + (l + b))
        val bN = sdiv2((lN - l) + b)
        val sN = sdiv2((y - lN) + s(0))
        System.arraycopy(s, 1, s, 0, 23); s(23) = sN
        l = lN; b = bN
      }
      assert(l == row.getAs[Long]("level_k"), s"$t level")
      assert(b == row.getAs[Long]("trend_k"), s"$t trend")
      val errs = (1 to 24).map { h =>
        val pred = l + h * b + s(h - 1)
        seq(seq.length - 24 + h - 1) - pred
      }
      assert(errs.map(e => math.abs(e)).sum / 24 == row.getAs[Long]("mae_k"), s"$t mae")
      assert(errs.sum == row.getAs[Long]("err_sum_k"), s"$t bias")
    }
  }

  test("psi_value_drift: PSI is non-negative (every (p-q)ln(p/q) term is) with <= 10 bins") {
    val rows = q("psi_value_drift")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("psi_um") >= 0, r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_bins") <= 10)
    }
  }

  test("silhouette_simplified: scores bounded in [-1, 1] micros, min <= mean") {
    q("silhouette_simplified", "sf0.01").foreach { r =>
      val mean = r.getAs[Long]("s_mean_um"); val mn = r.getAs[Long]("s_min_um")
      assert(mean >= -1000000L && mean <= 1000000L)
      assert(mn <= mean)
    }
  }

  test("hits_hubs_authorities: L-inf normalization attains 1e6 and stays in (0, 1e6]") {
    val auths = q("hits_hubs_authorities", "sf0.01").map(_.getAs[Long]("auth_um"))
    assert(auths.max == 1000000L, "some brand must sit at the norm ceiling")
    assert(auths.forall(a => a > 0 && a <= 1000000L))
  }

  test("cross_correlation_lags: r bounded, overlap shrinks with |lag|") {
    val rows = q("cross_correlation_lags").map(r =>
      (r.getAs[Long]("lag"), r.getAs[Long]("n"), r.getAs[Long]("r_um")))
    assert(rows.length == 13)
    val n0 = rows.find(_._1 == 0L).get._2
    rows.foreach { case (lag, n, r) =>
      assert(math.abs(r) <= 1000000L)
      assert(n == n0 - math.abs(lag), "dense spine overlap = n - |lag|")
    }
  }
}
