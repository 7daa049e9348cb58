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

  test("dot_f32 NULL semantics match the HOF form on degenerate inputs") {
    import spark.implicits._
    graft.functions.DotF32.register(spark)
    val df = Seq(
      ("eq", Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),   // 11.0
      ("len_mismatch", Some(Array(1.0f, 2.0f)), Some(Array(3.0f))), // NULL
      ("null_side", None, Some(Array(1.0f))),                      // NULL
      ("empty", Some(Array.empty[Float]), Some(Array.empty[Float])) // 0.0
    ).toDF("k", "a", "b")
    val native = df.select(col("k"), expr("dot_f32(a, b)").as("d"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val hof = df.select(col("k"), graft.vec.VecOps.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(native == hof, s"native=$native hof=$hof")
    assert(native("eq") == 11.0 && native("len_mismatch") == null &&
      native("null_side") == null && native("empty") == 0.0)
  }

  test("bloom_agg/might_contain resolve via function registration and agree with an exact semi-join") {
    graft.functions.BloomFuncs.register(spark)
    val t = graft.Tables(spark, sf("sf0.001"))
    t.customer.limit(50).select(col("c_custkey")).createOrReplaceTempView("ge_bloom_dim")
    val bloomKept = t.orders.filter(expr(
      """might_contain((SELECT bloom_agg(xxhash64(c_custkey)) FROM ge_bloom_dim),
         xxhash64(o_custkey))"""))
      .select(col("o_orderkey"))
    val exactKept = t.orders
      .join(spark.table("ge_bloom_dim"), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    // superset with no false negatives
    assert(exactKept.join(bloomKept, Seq("o_orderkey"), "left_anti").count() == 0)
    assert(bloomKept.count() >= exactKept.count())
  }

  test("dot_f32 returns NULL on null array elements, matching the HOF") {
    graft.functions.DotF32.register(spark)
    val row = spark.sql(
      "SELECT dot_f32(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d, " +
        "aggregate(zip_with(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)), (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (s, x) -> s + x) AS h").head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }
}
