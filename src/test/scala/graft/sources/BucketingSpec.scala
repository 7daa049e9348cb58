package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed tables — the co-located join layout of the 100 TB playbook
  * (SURVEY.md §4): writing both join sides bucketed by the key lets a
  * sort-merge join read co-located buckets with NO exchange on either
  * side. At fixture scale this proves the layout works end-to-end; at
  * 100 TB it removes the dominant shuffle from every recurring
  * fact-to-fact join on the bucket key. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without exchanges") {
    val t = graft.Tables(spark, sf("sf0.001"))
    // disable broadcast so the join exercises the bucketed SMJ path
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      t.orders.write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bkt")
      t.customer.withColumnRenamed("c_custkey", "o_custkey")
        .write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("customer_bkt")

      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), "o_custkey")
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(600)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
