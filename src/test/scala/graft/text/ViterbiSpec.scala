package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent cross-check of `unigram_viterbi_segment`: the query's
  * two-slot rolling fold is replayed here as a PLAIN full-table DP over
  * every prefix (a different algorithm shape with no state compression),
  * with costs derived locally from first principles. Also pins the
  * objective-packing contract: v = cost·1024 + pieces decodes to a
  * true lexicographic (cost, pieces) argmin. */
class ViterbiSpec extends SparkSpec {

  private lazy val dict: Map[String, Long] = {
    val rows = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count().collect()
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def costs: (Map[String, Long], Map[String, Long]) = {
    val ch = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val bg = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    dict.foreach { case (w, f) =>
      w.foreach(c => ch(c.toString) += f)
      w.sliding(2).filter(_.length == 2).foreach(b => bg(b) += f)
    }
    val t1 = ch.values.sum.toDouble
    val t2 = bg.values.sum.toDouble
    (ch.map { case (k, v) => k -> math.round(-math.log(v / t1) * 1e6) }.toMap,
      bg.map { case (k, v) => k -> math.round(-math.log(v / t2) * 1e6) }.toMap)
  }

  /** Full-table DP: best[i] over ALL prefixes, no rolling state. */
  private def dp(w: String, c1: Map[String, Long], c2: Map[String, Long]): Long = {
    val big = 1000000000000000L
    val best = Array.fill(w.length + 1)(big)
    best(0) = 0L
    for (i <- 1 to w.length) {
      best(i) = best(i - 1) + c1(w.substring(i - 1, i)) * 1024 + 1
      if (i >= 2)
        best(i) = math.min(best(i),
          best(i - 2) + c2(w.substring(i - 2, i)) * 1024 + 1)
    }
    best(w.length)
  }

  test("query fold equals the independent full-table DP on every word") {
    val (c1, c2) = costs
    val got = graft.SparkEntry.queries("unigram_viterbi_segment")(
      spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == dict.keySet)
    dict.keys.foreach { w =>
      val v = dp(w, c1, c2)
      assert(got(w) == (v % 1024, v / 1024),
        s"$w: query ${got(w)} != reference (${v % 1024}, ${v / 1024})")
    }
  }

  test("objective packing is a true lexicographic (cost, pieces) argmin") {
    val (c1, c2) = costs
    // enumerate ALL segmentations (pieces of length 1-2) for each word
    // and take the lexicographic minimum by (cost, pieces) — the packed
    // objective must select exactly this pair
    def segs(w: String): Seq[(Long, Long)] =
      if (w.isEmpty) Seq((0L, 0L))
      else {
        val one = segs(w.substring(1)).map { case (c, p) =>
          (c + c1(w.substring(0, 1)), p + 1) }
        val two = if (w.length >= 2)
          segs(w.substring(2)).map { case (c, p) =>
            (c + c2(w.substring(0, 2)), p + 1) }
        else Seq.empty
        one ++ two
      }
    dict.keys.filter(_.length <= 8).foreach { w =>
      val want = segs(w).min
      val v = dp(w, c1, c2)
      assert((v / 1024, v % 1024) == want,
        s"$w: packed argmin (${v / 1024}, ${v % 1024}) != exhaustive $want")
    }
  }
}
