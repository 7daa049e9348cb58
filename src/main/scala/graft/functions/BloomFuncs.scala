package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** User-callable runtime-filter functions (SURVEY.md §2.11 scale ops).
  *
  * Spark's `InjectRuntimeFilter` rule builds a bloom filter over a join's
  * build side and semi-filters the probe side before its shuffle — but only
  * fires when CBO statistics make the sides' sizes provable. These two
  * registrations expose the exact same Catalyst machinery
  * ([[BloomFilterAggregate]] / [[BloomFilterMightContain]]) to query
  * authors, so the 100 TB pattern — tiny filtered dim → bloom bytes →
  * probe-side scan prune — can be forced where the optimizer has no stats:
  *
  * {{{
  *   SELECT ... FROM fact
  *   WHERE might_contain((SELECT bloom_agg(xxhash64(k), 1000) FROM dim),
  *                       xxhash64(fact.k))
  * }}}
  *
  * The scalar subquery executes once (a one-row aggregate — at cluster
  * scale a map-side-combined agg over the dim), its binary result travels
  * with the plan like a broadcast var, and the probe filter evaluates
  * locally per row with zero shuffle. False positives are removed by the
  * join that follows, so the rewrite is semantics-preserving.
  */
object BloomFuncs {
  /** Register `bloom_agg` and `might_contain` (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val aggId = FunctionIdentifier("bloom_agg")
    if (!registry.functionExists(aggId)) {
      registry.registerFunction(
        aggId,
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
        (exprs: Seq[Expression]) => exprs match {
          case Seq(child)              => new BloomFilterAggregate(child)
          case Seq(child, items)       => new BloomFilterAggregate(child, items)
          case Seq(child, items, bits) => new BloomFilterAggregate(child, items, bits)
          case _ => throw new IllegalArgumentException("bloom_agg(child[, items[, bits]])")
        })
    }
    val mcId = FunctionIdentifier("might_contain")
    if (!registry.functionExists(mcId)) {
      registry.registerFunction(
        mcId,
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
        (exprs: Seq[Expression]) => BloomFilterMightContain(exprs.head, exprs(1)))
    }
  }
}
