package graft.functions

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._

class NGramsGeneratorSpec extends SparkSpec {
  import spark.implicits._

  private def viaGenerator(texts: Seq[String], n: Int) = {
    NGramsGenerator.register(spark)
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .selectExpr("doc_id", s"ngrams_gen(t, $n)")
      .orderBy("doc_id", "pos")
      .collect().toSeq
  }

  test("streams the same (pos, ngram) rows as posexplode(shinglesAll)") {
    val texts = Seq("a b c d e", "x y", "repeat repeat repeat repeat", "solo")
    for (n <- Seq(1, 2, 3)) {
      val expected = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          posexplode(TextOps.shinglesAll(col("text"), n)).as(Seq("pos", "ngram")))
        .orderBy("doc_id", "pos")
        .collect().toSeq
      assert(viaGenerator(texts, n) == expected, s"n=$n")
    }
  }

  test("short docs and null token arrays yield no rows, not a crash") {
    NGramsGenerator.register(spark)
    val out = Seq((1L, Some("one two")), (2L, None), (3L, Some("a b c")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), when(col("text").isNotNull,
        TextOps.tokens(col("text"))).as("t"))
      .selectExpr("doc_id", "ngrams_gen(t, 3)")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L)) // only the 3-token doc
  }

  test("duplicate n-grams keep their positions (multiplicity preserved)") {
    val rows = viaGenerator(Seq("go go go go"), 2)
    assert(rows.map(r => (r.getInt(1), r.getString(2))) ==
      Seq((0, "go go"), (1, "go go"), (2, "go go")))
  }
}
