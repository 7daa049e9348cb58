package graft.plans

import graft.SparkSpec
import graft.vec.VecOps
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("RewriteHofDotProduct turns the portable HOF dot into dot_f32") {
    spark.experimental.extraOptimizations = Seq(RewriteHofDotProduct)
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val n = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val hof = q.crossJoin(n).filter(col("qid") < col("nid"))
      .withColumn("d", VecOps.dot(col("qe"), col("ne")))   // HOF form
      .select("qid", "nid", "d")

    assert(hof.queryExecution.optimizedPlan.toString.toLowerCase.contains("dot_f32"),
      "optimizer should have rewritten aggregate(zip_with(...)) to dot_f32")

    // semantics preserved: equals the native expression bit-for-bit
    graft.functions.DotF32.register(spark)
    val native = q.crossJoin(n).filter(col("qid") < col("nid"))
      .withColumn("d", expr("dot_f32(qe, ne)"))
      .select("qid", "nid", "d")
    val a = hof.orderBy("qid", "nid").collect().map(_.getDouble(2))
    val b = native.orderBy("qid", "nid").collect().map(_.getDouble(2))
    assert(a.sameElements(b))
  }
}
