package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKHeapAggSpec extends SparkSpec {
  import spark.implicits._

  private def heapUdaf(k: Int) = udaf(new TopKAggregator(k),
    org.apache.spark.sql.Encoders.product[ScoredId])

  // adversarial tie-heavy relation: 10^4 rows, 97 groups, scores drawn
  // from 7 values so (score DESC, id ASC) tiebreaks decide most slots
  private def ties = spark.range(10000)
    .select((col("id") % 97).as("qid"), col("id").as("nid"),
      ((col("id") * 31) % 7).cast("double").as("score"))

  test("topk_heap ≡ udaf(TopKAggregator) on tie-heavy data, several k") {
    TopKHeapAgg.register(spark)
    for (k <- Seq(1, 3, 8, 16); parts <- Seq(1, 7)) {
      val in = ties.repartition(parts, col("nid")) // shake merge order
      val a = in.groupBy(col("qid"))
        .agg(heapUdaf(k)(col("score"), col("nid")).as("top"))
        .select(col("qid"), to_json(col("top")).as("j"))
        .orderBy("qid").collect().toSeq
      val b = in.groupBy(col("qid"))
        .agg(expr(s"topk_heap(score, nid, $k)").as("top"))
        .select(col("qid"), to_json(col("top")).as("j"))
        .orderBy("qid").collect().toSeq
      assert(a == b, s"k=$k parts=$parts: native heap diverged from udaf")
    }
  }

  test("descending-feed worst case and singleton groups match") {
    TopKHeapAgg.register(spark)
    // scores strictly descending in arrival order within each group —
    // every accepted row lands at the tail (the O(1) reject path never
    // fires until the buffer fills)
    val in = spark.range(2000)
      .select((col("id") % 5).as("qid"), col("id").as("nid"),
        (lit(5000) - col("id")).cast("double").as("score"))
    val a = in.groupBy(col("qid"))
      .agg(heapUdaf(4)(col("score"), col("nid")).as("top"))
      .select(col("qid"), to_json(col("top")).as("j")).orderBy("qid").collect().toSeq
    val b = in.groupBy(col("qid"))
      .agg(expr("topk_heap(score, nid, 4)").as("top"))
      .select(col("qid"), to_json(col("top")).as("j")).orderBy("qid").collect().toSeq
    assert(a == b)
  }

  test("null score or id rows are skipped, not inserted as zero") {
    TopKHeapAgg.register(spark)
    val in = Seq[(Long, Option[Double], Option[Long])](
      (1L, Some(5.0), Some(10L)), (1L, None, Some(11L)),
      (1L, Some(9.0), None), (1L, Some(2.0), Some(12L)))
      .toDF("qid", "score", "nid")
    val out = in.groupBy(col("qid"))
      .agg(expr("topk_heap(score, nid, 3)").as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.score"), col("t.id")).orderBy(desc("score"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((5.0, 10L), (2.0, 12L)))
  }

  test("type contract refuses un-cast inputs loudly") {
    TopKHeapAgg.register(spark)
    val in = Seq((1, 2, 3)).toDF("qid", "nid", "score")
    val e = intercept[Exception] {
      in.groupBy(col("qid")).agg(expr("topk_heap(score, nid, 3)")).collect()
    }
    assert(e.getMessage.contains("topk_heap") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
