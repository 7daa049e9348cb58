package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Tripwire for the documented NEXT.md soft spot: `heavy_hitter_tokens`
  * references its expensive token-counts aggregate TWICE (per-token
  * counts + the one-row total) and relies on the two subtrees being
  * bit-identical so ReusedExchange computes the corpus scan ONCE at
  * runtime. A refactor that makes the subtrees differ silently doubles
  * the corpus scan — this spec EXECUTES the query (AQE materializes the
  * reuse only in the finalized adaptive plan) and asserts it survived.
  *
  * (`decontamination_bloom` was ALSO listed in the round-4b note, but
  * its two train-side references — the bloom_agg build and the exact
  * semi-join's distinct grams — are structurally DIFFERENT aggregates,
  * so no reuse is possible by construction; the executed plan confirms
  * none exists. The note overclaimed; the bloom pre-screen's value is
  * the cheap probe, not scan dedup.) */
class ReusedExchangeSpec extends SparkSpec {

  private def reusedCount(name: String): Int = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    // materialize THIS DataFrame (count() would build its own separate
    // queryExecution): AQE finalizes the adaptive plan only on execution
    df.collect()
    // reuse lives INSIDE ShuffleQueryStageExec, which is a leaf to
    // collect() — the plan string is the robust way to see it
    "ReusedExchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("heavy_hitter_tokens computes the token-counts subtree once (ReusedExchange)") {
    assert(reusedCount("heavy_hitter_tokens") >= 1,
      "the twice-referenced token-counts aggregate no longer reuses its " +
        "exchange — the corpus is being scanned twice")
  }

}
