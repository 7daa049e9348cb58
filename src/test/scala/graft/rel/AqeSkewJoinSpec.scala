package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE runtime skew handling (SURVEY.md §4): the OTHER half of the skew
  * playbook next to explicit salting (SkewJoin). With thresholds forced
  * low, a sort-merge join over a deliberately skewed key must come out of
  * execution with OptimizeSkewedJoin having SPLIT the hot partition —
  * visible as `skew=true` on the SMJ and "skewed" AQEShuffleReads — and
  * the result must equal the non-adaptive join. On a real cluster the
  * default thresholds (256 MB / 5× median) do this unprompted; the spec
  * pins that the mechanism engages and stays result-invisible. */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed partition and preserves the join result") {
    // isolated session: conf mutations must not leak into other suites
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.forceApply", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    import s.implicits._

    // 90% of fact rows share one key — the classic hot-key profile
    val fact = s.range(20000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 97).as("k"),
        col("id").as("v"))
    val dim = s.range(97).select(col("id").as("k"), concat(lit("seg"), col("id") % 5).as("seg"))

    val joined = fact.join(dim, Seq("k")).groupBy("seg")
      .agg(count(lit(1)).as("n"), sum("v").as("s")).orderBy("seg")
    val got = joined.collect().toSeq

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"OptimizeSkewedJoin did not engage — executed plan:\n${plan.take(2000)}")

    // ground truth from a plain non-adaptive session
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val fact2 = s2.range(20000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 97).as("k"),
        col("id").as("v"))
    val dim2 = s2.range(97).select(col("id").as("k"), concat(lit("seg"), col("id") % 5).as("seg"))
    val want = fact2.join(dim2, Seq("k")).groupBy("seg")
      .agg(count(lit(1)).as("n"), sum("v").as("s")).orderBy("seg").collect().toSeq
    assert(got == want, "skew-split join changed the result")
  }
}
