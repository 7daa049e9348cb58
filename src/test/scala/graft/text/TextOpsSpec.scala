package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: word trigrams of a known string") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val sh = df.select(TextOps.shingles(col("text"), 3).as("s")).as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d", "c d e"))
  }

  test("shingles: docs shorter than n yield an empty set, not a crash") {
    val df = Seq((1L, "a b"), (2L, ""), (3L, "a b c")).toDF("doc_id", "text")
    val sh = df.orderBy("doc_id")
      .select(TextOps.shingles(col("text"), 3).as("s")).as[Seq[String]].collect()
    assert(sh(0) == Seq.empty && sh(1) == Seq.empty && sh(2) == Seq("a b c"))
  }

  test("minhash: identical token sets get identical signatures") {
    val docs = Seq(
      (1L, "spark query engine fast spark query"),
      (2L, "query spark fast engine"), // same token set, different order/counts
      (3L, "completely different words here")
    ).toDF("doc_id", "text")
    // unigram shingles = distinct tokens
    val sig = TextOps.minhashSignature(TextOps.explodedShingles(docs, 1), 8)
      .orderBy("doc_id").collect()
    val s1 = (0 until 8).map(i => sig(0).getAs[Long](s"h$i"))
    val s2 = (0 until 8).map(i => sig(1).getAs[Long](s"h$i"))
    val s3 = (0 until 8).map(i => sig(2).getAs[Long](s"h$i"))
    assert(s1 == s2)
    assert(s1 != s3)
  }

  test("near-dup pipeline finds a planted trigram near-duplicate") {
    val base = "the big fast query engine scans the sorted column table every time"
    val nearDup = base.replace("sorted", "hashed") // high trigram overlap
    val other = "x y z " * 10
    val docs = Seq((1L, base), (2L, nearDup), (3L, other.trim)).toDF("doc_id", "text")
    val pairs = TextOps.nearDupPairs(docs, n = 3, bands = 8, rowsPerBand = 2, minJaccard = 0.3)
      .collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("doc_a") == 1L && pairs(0).getAs[Long]("doc_b") == 2L)
  }

  test("simhash: near-identical docs differ in few bits, unrelated in many") {
    def popcount(x: Long): Int = java.lang.Long.bitCount(x)
    val docs = Seq(
      (1L, "spark table scan filter group agg join sort window stream"),
      (2L, "spark table scan filter group agg join sort window batch"), // 1 token swap
      (3L, "row key hash merge dup line part order customer value")
    ).toDF("doc_id", "text")
    val f = TextOps.simhash(docs).orderBy("doc_id").collect()
      .map(_.getAs[Long]("simhash"))
    val near = popcount(f(0) ^ f(1))
    val far = popcount(f(0) ^ f(2))
    assert(near < far, s"near=$near far=$far")
  }

  test("simhash plan: one Generate (token explode), one aggregation, one shuffle") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val docs = Seq((1L, "a b c"), (2L, "c d e")).toDF("doc_id", "text")
    // AQE wraps the plan and hides it from collect(); unwrap to the
    // current physical plan (shape, not runtime re-optimization, is
    // what's pinned here)
    val plan = TextOps.simhash(docs).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val generates = plan.collect { case g: GenerateExec => g }
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    val aggs = plan.collect {
      case a: HashAggregateExec => a
      case a: ObjectHashAggregateExec => a
      case a: SortAggregateExec => a
    }
    assert(generates.size == 1, s"exactly the token explode, no ×60 bit explode:\n$plan")
    assert(shuffles.size == 1, s"one doc_id shuffle:\n$plan")
    // one logical aggregation = 2 physical (partial + final); the old
    // two-level formulation had 4
    assert(aggs.size == 2, s"single aggregation level (partial+final):\n$plan")
  }

  test("hash60 is non-negative and stable") {
    val v = Seq(("a")).toDF("x").select(TextOps.hash60(col("x"))).as[Long].head()
    assert(v == 57446577476672362L) // cross-checked against DuckDB '0x'||substr(md5('a'),1,15)
  }

  test("connected components: chain, triangle, isolated pair, min labels") {
    // components: {1,2,3,4} (a chain — needs >1 propagation round),
    // {10,11,12} (triangle), {20,21} (isolated pair)
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("doc_a", "doc_b")
    val got = TextOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: long chain converges within diameter rounds") {
    // a 12-node path: worst-case diameter for min-label propagation
    val pairs = (0L until 11L).map(i => (i + 1, i)).toDF("doc_a", "doc_b")
    val got = TextOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 12 && got.values.forall(_ == 0L))
  }

  test("post-agg raise_error overflow guard actually fires (kn_perplexity idiom)") {
    // Pins the round-13 guard SHAPE: a row-level CASE over the aggregated
    // sum whose else-branch is raise_error, added (+0) into the value.
    // The round-12 form — assert_true inside IF(…, 0L, 0L) WITHIN the agg
    // expression — was measured dead (equal-branch IF simplified away),
    // so this test exists to catch any optimizer change re-killing it.
    import org.apache.spark.sql.functions._
    val df = Seq(1L, 5L).toDF("c2")
    def tot(lim: Long) = df.agg(count(lit(1)).as("_n"), sum($"c2").as("_s"))
      .select((col("_n") + when(col("_s") <= lim, lit(0L))
        .otherwise(raise_error(lit("envelope exceeded")))).as("n1tot"))
    assert(tot(100L).as[Long].head() == 2L)
    val e = intercept[Exception] { tot(2L).collect() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("envelope exceeded"), s"guard did not fire: $msgs")
  }
}
