package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("heap top-k equals the window formulation regardless of partitioning") {
    val rnd = new scala.util.Random(11)
    // heavy score ties to exercise the (score DESC, id ASC) tiebreak
    val rows = Seq.tabulate(5000)(i => (i % 7, rnd.nextInt(40).toDouble, i.toLong))
    val topk = udaf(new TopKAggregator(5), Encoders.product[ScoredId])
    def run(numParts: Int) = rows.toDF("g", "score", "id")
      .repartition(numParts, col("id"))
      .groupBy(col("g"))
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("g"), col("i"), col("t.score"), col("t.id"))
      .orderBy("g", "i")
      .collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val expected = rows.toDF("g", "score", "id")
      .withColumn("i", row_number().over(w) - 1).filter(col("i") < 5)
      .select(col("g"), col("i").cast("int"), col("score"), col("id"))
      .orderBy("g", "i")
      .collect().toSeq
    assert(run(3) == expected)
    assert(run(37) == expected) // different partitioning, identical result
  }

  test("groups smaller than k return all rows; empty input returns nothing") {
    val topk = udaf(new TopKAggregator(10), Encoders.product[ScoredId])
    val small = Seq((1, 5.0, 1L), (1, 7.0, 2L)).toDF("g", "score", "id")
      .groupBy(col("g")).agg(topk(col("score"), col("id")).as("top"))
      .select(size(col("top"))).as[Int].head()
    assert(small == 2)
    val empty = Seq.empty[(Int, Double, Long)].toDF("g", "score", "id")
      .groupBy(col("g")).agg(topk(col("score"), col("id")).as("top"))
    assert(empty.count() == 0)
  }
}
