package graft.plans

import graft.SparkSpec
import graft.ts.TimeSeries
import org.apache.spark.sql.functions._

class AsofJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of join equals the window-trick formulation on the fixture") {
    val ev = graft.Tables(spark, sf("sf0.001")).events
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value".as("purchase_value"))
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"value").as("click_value"))

    val native = AsofJoinNative.asofJoin(purchases, clicks, "user_id", "ts", "ts", Seq("click_value"))
      .orderBy("event_id").collect()
    val windowed = TimeSeries.asofJoin(purchases, clicks, "user_id", "ts", "ts", Seq("click_value"))
      .orderBy("event_id").collect()
    assert(native.length == windowed.length && native.nonEmpty)
    native.zip(windowed).foreach { case (n, w) => assert(n == w) }
  }

  test("hand-built cases: latest-at-or-before, no-match null, key isolation") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 10:00:00")), // key with no right rows at all
      (3L, ts("2024-01-01 09:00:00"))  // right rows exist but all later
    ).toDF("k", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 9.0),
      (1L, ts("2024-01-01 10:00:00"), 10.0), // equal ts: counts (<=)
      (1L, ts("2024-01-01 11:00:00"), 11.0),
      (3L, ts("2024-01-01 23:00:00"), 23.0)
    ).toDF("k", "ts", "v")
    val got = AsofJoinNative.asofJoin(left, right, "k", "ts", "ts", Seq("v"))
      .orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 10.0), (1L, 11.0), (2L, null), (3L, null)))
  }

  test("NULL keys match nothing on either side (SQL join semantics)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (Some(1L), ts("2024-01-01 10:00:00")),
      (None: Option[Long], ts("2024-01-01 10:00:00"))
    ).toDF("k", "ts")
    val right = Seq(
      (Some(1L), ts("2024-01-01 09:00:00"), 9.0),
      (None: Option[Long], ts("2024-01-01 09:00:00"), -99.0)
    ).toDF("k", "ts", "v")
    val got = AsofJoinNative.asofJoin(left, right, "k", "ts", "ts", Seq("v"))
      .orderBy($"k".asc_nulls_last)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 9.0), (null, null)), got.mkString(","))
  }

  test("randomized: native merge equals a Scala brute-force reference") {
    val rnd = new scala.util.Random(42) // fixed seed — deterministic test
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision rows
    // skewed keys (many collisions), duplicate left timestamps, keys
    // missing from either side
    val leftRows = Seq.tabulate(400)(i =>
      (rnd.nextInt(12).toLong, ts(1700000000000000L + rnd.nextInt(100000) * 1000000L), i.toLong))
    val rightRows = Seq.tabulate(300) { i =>
      // distinct (key, ts) on the right: asof semantics are only fully
      // determined when right rows are unique per (key, ts)
      (rnd.nextInt(14).toLong, ts(1700000000000000L + i * 333000000L), i * 1.5)
    }
    val left = leftRows.toDF("k", "ts", "lid")
    val right = rightRows.toDF("k", "ts", "v")

    val got = AsofJoinNative.asofJoin(left, right, "k", "ts", "ts", Seq("v"))
      .select($"lid", $"v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap

    val byKey = rightRows.groupBy(_._1)
    val expected = leftRows.map { case (k, t, lid) =>
      val cand = byKey.getOrElse(k, Seq.empty).filter(!_._2.after(t))
      lid -> (if (cand.isEmpty) null else cand.maxBy(_._2.getTime)._3)
    }.toMap
    assert(got.size == expected.size)
    expected.foreach { case (lid, v) =>
      assert(got(lid) == v, s"lid=$lid got=${got(lid)} want=$v")
    }
  }

  test("randomized: tolerance path equals brute-force with max-lookback filter") {
    val rnd = new scala.util.Random(7) // fixed seed — deterministic test
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val tolUs = 500000000L // 500 s — chosen so both in- and out-of-tol matches occur
    val leftRows = Seq.tabulate(400)(i =>
      (rnd.nextInt(12).toLong, ts(1700000000000000L + rnd.nextInt(100000) * 1000000L), i.toLong))
    val rightRows = Seq.tabulate(300) { i =>
      (rnd.nextInt(14).toLong, ts(1700000000000000L + i * 333000000L), i * 1.5)
    }
    val got = AsofJoinNative.asofJoin(
        leftRows.toDF("k", "ts", "lid"), rightRows.toDF("k", "ts", "v"),
        "k", "ts", "ts", Seq("v"), tolUs = Some(tolUs))
      .select($"lid", $"v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val byKey = rightRows.groupBy(_._1)
    var nMatched = 0
    leftRows.foreach { case (k, t, lid) =>
      val cand = byKey.getOrElse(k, Seq.empty)
        .filter(r => !r._2.after(t) && (t.getTime - r._2.getTime) * 1000L <= tolUs)
      val want = if (cand.isEmpty) null else cand.maxBy(_._2.getTime)._3
      if (want != null) nMatched += 1
      assert(got(lid) == want, s"lid=$lid got=${got(lid)} want=$want")
    }
    // the tolerance must actually bite: some matches survive, some are cut
    val gotNoTol = AsofJoinNative.asofJoin(
        leftRows.toDF("k", "ts", "lid"), rightRows.toDF("k", "ts", "v"),
        "k", "ts", "ts", Seq("v"))
      .filter($"v".isNotNull).count()
    assert(nMatched > 0 && nMatched < gotNoTol)
  }

  test("physical plan uses AsofJoinExec with co-partitioned sorted children") {
    val ev = graft.Tables(spark, sf("sf0.001")).events
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value".as("purchase_value"))
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"value").as("click_value"))
    val df = AsofJoinNative.asofJoin(purchases, clicks, "user_id", "ts", "ts", Seq("click_value"))
    df.count() // force AQE to finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(400))
    assert(!plan.contains("WindowExec") && !plan.contains("Union"),
      "native path must not fall back to the union+window formulation")
  }
}
