package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of A-ES weighted sampling (`weighted_sample_aes`): the
  * integer-nano priority order agrees with the real-valued
  * u^(1/w) order it discretizes, and across many salts the sample is
  * genuinely weight-biased (heavier docs selected more often than
  * uniform would). */
class WeightedSampleSpec extends SparkSpec {

  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private lazy val docs: Vector[(Long, Int)] =
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), size(split(trim(col("text")), " ")).as("w"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toVector

  test("integer-nano priority order equals the real u^(1/w) A-ES order") {
    val byFloat = docs.map { case (id, w) =>
      val u = (hash60(s"aes:$id") + 1).toDouble / math.pow(2, 60)
      // A-ES keeps the k LARGEST u^(1/w); sort descending, tie by id
      (id, math.pow(u, 1.0 / w))
    }.sortBy { case (id, key) => (-key, id) }.take(20).map(_._1)
    val got = graft.SparkEntry.queries("weighted_sample_aes")(spark, sf("sf0.001"))
      .collect().map(_.getLong(1)).toVector
    assert(got == byFloat,
      "nano-discretized -ln(u)/w order diverged from u^(1/w) order")
  }

  test("across salts the sample over-represents heavy documents") {
    val meanW = docs.map(_._2.toLong).sum.toDouble / docs.length
    val sampledMeans = (1 to 30).map { salt =>
      val top = docs.map { case (id, w) =>
        val u = (hash60(s"salt$salt:$id") + 1).toDouble / math.pow(2, 60)
        (w, -math.log(u) / w)
      }.sortBy(_._2).take(20)
      top.map(_._1.toLong).sum.toDouble / top.length
    }
    val grand = sampledMeans.sum / sampledMeans.length
    // with w in [10, 100], weighted sampling pulls the sampled mean well
    // above the corpus mean; uniform sampling would center on meanW
    assert(grand > meanW * 1.15,
      f"sampled mean weight $grand%.1f not above corpus mean $meanW%.1f")
  }
}
