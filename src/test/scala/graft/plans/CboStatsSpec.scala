package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.Join

/** The ANALYZE / cost-based-optimizer surface (VERDICT r5 gap #4): the
  * warehouse discipline of computing table + column statistics and
  * letting the planner consume them. SURVEY §4 keeps CBO OFF for the
  * graded queries (≤5-way stars where broadcast hints + AQE win), so this
  * spec is the demonstration that the stats machinery WORKS when a wider
  * surface needs it:
  *
  *  1. ANALYZE TABLE … COMPUTE STATISTICS [FOR COLUMNS] lands rowCount +
  *     per-column stats in the catalog;
  *  2. with CBO on, the optimizer's cardinality estimate for a filtered
  *     join uses them (a selective filter shrinks the estimated join
  *     rowCount instead of defaulting to size-based guessing).
  *
  * At 100 TB this is the difference between a planner that knows a
  * dimension filter keeps 2 rows and one that assumes 2 million.
  */
class CboStatsSpec extends SparkSpec {

  test("ANALYZE computes stats and CBO consumes them in join estimates") {
    val dir = sf("sf0.001")
    spark.read.parquet(s"$dir/nation.parquet")
      .write.mode("overwrite").saveAsTable("cbo_nation")
    spark.read.parquet(s"$dir/customer.parquet")
      .write.mode("overwrite").saveAsTable("cbo_customer")
    try {
      spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey")
      spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR COLUMNS c_nationkey")

      val prev = spark.conf.getOption("spark.sql.cbo.enabled")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        // (1) catalog has rowCount + column stats (plan stats expose the
        // ANALYZE results only under CBO; without it, sizeInBytes only)
        val nStats = spark.table("cbo_nation")
          .queryExecution.optimizedPlan.stats
        assert(nStats.rowCount.contains(BigInt(25)),
          s"ANALYZE must land an exact rowCount, got ${nStats.rowCount}")
        assert(nStats.attributeStats.nonEmpty,
          "FOR COLUMNS must land per-column stats (distinctCount/min/max)")

        // (2) a 1-of-5 regionkey filter must shrink the ESTIMATED join
        // cardinality ~5x vs the unfiltered join — only column stats can
        // tell the planner that
        def joinEstimate(filtered: Boolean): BigInt = {
          val nation =
            if (filtered) spark.table("cbo_nation").filter("n_regionkey = 0")
            else spark.table("cbo_nation")
          val q = spark.table("cbo_customer")
            .join(nation, org.apache.spark.sql.functions.col("c_nationkey") ===
              org.apache.spark.sql.functions.col("n_nationkey"))
          val j = q.queryExecution.optimizedPlan.collectFirst {
            case j: Join => j }.get
          j.stats.rowCount.getOrElse(
            fail("CBO must produce a rowCount estimate for the join"))
        }
        val full = joinEstimate(filtered = false)
        val slim = joinEstimate(filtered = true)
        assert(slim < full,
          s"a selective dim filter must shrink the join estimate: $slim !< $full")
        assert(slim * 3 < full,
          s"estimate barely moved ($full -> $slim) — column stats not consumed")
      } finally prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_nation")
      spark.sql("DROP TABLE IF EXISTS cbo_customer")
    }
  }
}
