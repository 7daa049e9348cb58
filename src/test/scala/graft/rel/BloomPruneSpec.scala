package graft.rel

import graft.{SparkSpec, Tables}
import graft.functions.BloomFuncs
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
import org.apache.spark.sql.functions._

/** Guards for the user-forced runtime bloom filter (functions/BloomFuncs):
  * the filter must actually prune, must never drop a true match (bloom
  * guarantees no false negatives), and must sit BELOW the join in the
  * optimized plan — pruning after the join would be a no-op that still
  * pays the full shuffle. */
class BloomPruneSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def prunedOrders = {
    BloomFuncs.register(spark)
    val t = Tables(spark, dir)
    t.customer.filter(col("c_acctbal") > 9000).createOrReplaceTempView("bloom_dim_v")
    t.orders.filter(expr(
      """might_contain(
           (SELECT bloom_agg(xxhash64(c_custkey), CAST(4096 AS BIGINT)) FROM bloom_dim_v),
           xxhash64(o_custkey))"""))
  }

  test("might_contain prunes probe rows, with zero false negatives") {
    val t = Tables(spark, dir)
    val pruned = prunedOrders
    val total = t.orders.count()
    val kept = pruned.count()
    assert(kept < total, s"bloom kept $kept of $total probe rows — never bit")
    val trueMatches = t.orders.join(spark.table("bloom_dim_v"),
      col("o_custkey") === col("c_custkey"), "left_semi")
    val dropped = trueMatches.join(pruned, Seq("o_orderkey"), "left_anti").count()
    assert(dropped == 0, s"bloom dropped $dropped true matches (impossible for a bloom)")
  }

  test("bloom_prune_revenue equals the plain join (false positives removed)") {
    val got = graft.SparkEntry.queries("bloom_prune_revenue")(spark, dir).collect().toSeq
    val t = Tables(spark, dir)
    val want = t.orders
      .join(t.customer.filter(col("c_acctbal") > 9000),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("c_mktsegment")
      .collect().toSeq
    assert(got == want)
  }

  test("optimized plan: might_contain filter sits below the join") {
    val plan = graft.SparkEntry.queries("bloom_prune_revenue")(spark, dir)
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty, "expected a join in the optimized plan")
    val below = joins.exists(_.collect {
      case f: Filter if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }.nonEmpty)
    assert(below, "might_contain filter is not below the join — pruning happens too late")
  }
}
