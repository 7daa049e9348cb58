package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity operators (SURVEY.md §1.2). Fixture vectors are
  * 64-dim float, L2-normalized (FIXTURES.md) → cosine ≡ dot product.
  *
  * Determinism: dot products are computed in DOUBLE, summing in index
  * order (aggregate() folds left) — the DuckDB oracle does the same, so
  * both engines run the identical IEEE-754 op sequence and the scores are
  * bit-identical; rank windows tie-break on vec_id.
  *
  * Scale notes (100 TB): brute-force top-k is a crossJoin — quadratic, the
  * honest baseline only. The LSH path buckets vectors by deterministic
  * random-hyperplane signs: the join is then an equi-join on bucket, whose
  * cost is Σ bucket² ≪ n². At 1000 executors both sides shuffle once on
  * the bucket key; no state is driver-sized.
  */
object VecOps {

  /** Index-ordered double-precision dot product of two float arrays.
    * Interpreted HOF fallback for arbitrary columns; the hot paths use the
    * codegen [[graft.functions.DotF32]] expression instead. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (s, x) => s + x)

  /** All-pairs scores (qid ≠ nid). Quadratic — baseline only. */
  def bruteForceScores(emb: DataFrame): DataFrame = {
    graft.functions.DotF32.register(emb.sparkSession)
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val n = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    q.crossJoin(n).filter(col("qid") =!= col("nid"))
      .withColumn("score", expr("dot_f32(qe, ne)"))
      .select("qid", "nid", "score")
  }

  /** Top-k per query from a (qid, nid, score) relation; rank ties broken
    * by nid. */
  def topK(scores: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("nid"))
    scores.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("score"))
  }

  /** Deterministic ±1 hyperplane component for (plane j, dim i): the low
    * bit of the md5-derived 60-bit hash of "hp{j}_{i}" — identical in the
    * DuckDB oracle. */
  private def hyperplaneSignExpr(j: Int): String =
    s"""aggregate(
          zip_with(embedding, transform(sequence(0, 63), i ->
            CASE WHEN (CAST(conv(substring(md5(concat('hp$j', '_', i)), 1, 15), 16, 10) AS BIGINT) & 1) = 1
                 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END),
            (x, y) -> CAST(x AS DOUBLE) * y),
          CAST(0.0 AS DOUBLE), (s, x) -> s + x)"""

  /** Random-hyperplane LSH bucket id from `planes` sign bits. */
  def lshBucket(emb: DataFrame, planes: Int): DataFrame = {
    val bucketExpr = (0 until planes).map { j =>
      s"CASE WHEN (${hyperplaneSignExpr(j)}) > 0.0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    emb.withColumn("bucket", expr(s"CAST($bucketExpr AS BIGINT)"))
  }

  /** ANN top-k: candidates restricted to the query's own LSH bucket. */
  def annLshTopK(emb: DataFrame, planes: Int, k: Int): DataFrame = {
    graft.functions.DotF32.register(emb.sparkSession)
    val b = lshBucket(emb, planes)
    val q = b.select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
    val n = b.select(col("vec_id").as("nid"), col("embedding").as("ne"), col("bucket"))
    val scores = q.join(n, "bucket").filter(col("qid") =!= col("nid"))
      .withColumn("score", expr("dot_f32(qe, ne)"))
      .select("qid", "nid", "score")
    topK(scores, k)
  }
}
