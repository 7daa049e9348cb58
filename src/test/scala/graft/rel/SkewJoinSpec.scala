package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join result equals plain join on skewed fixture data") {
    val t = graft.Tables(spark, sf("sf0.001"))
    val fact = t.events.select(col("user_id"), col("value"))
    val dim = t.customer.select(col("c_custkey").as("user_id"), col("c_mktsegment"))

    val plain = fact.join(dim, Seq("user_id"), "inner")
      .groupBy("user_id", "c_mktsegment").agg(count(lit(1)).as("n"), round(sum("value"), 4).as("s"))
      .orderBy("user_id").collect()
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "user_id", buckets = 8)
      .groupBy("user_id", "c_mktsegment").agg(count(lit(1)).as("n"), round(sum("value"), 4).as("s"))
      .orderBy("user_id").collect()

    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (a, b) => assert(a == b) }
  }
}
