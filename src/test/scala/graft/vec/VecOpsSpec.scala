package graft.vec

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot: double-precision index-ordered fold") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val d = df.select(VecOps.dot(col("a"), col("b")).as("d")).as[Double].head()
    assert(d == 32.0)
  }

  test("dot_i64: codegen integer dot matches the HOF form incl. null semantics") {
    graft.functions.DotI64.register(spark)
    val df = Seq(
      (Array(1, 2, 3), Array(4, 5, 6)),          // 32
      (Array(-127, 127), Array(127, 127)),       // 0
      (Array(1, 2), Array(1, 2, 3))              // length mismatch -> null
    ).toDF("a", "b")
    val out = df.select(
      expr("dot_i64(a, b)").as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS BIGINT) * y), CAST(0 AS BIGINT), (s, x) -> s + x)").as("hof"))
      .collect()
    out.foreach { r => assert(r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getLong(0) == r.getLong(1)), s"mismatch: $r") }
    assert(out(0).getLong(0) == 32L && out(1).getLong(0) == 0L && out(2).isNullAt(0))
  }

  test("brute-force top-k: ranks by score desc, ties by nid") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),   // identical to 0
      (2L, Array(0.0f, 1.0f)),   // orthogonal
      (3L, Array(0.7f, 0.7f))
    ).toDF("vec_id", "embedding")
    val top = VecOps.topK(VecOps.bruteForceScores(emb), 2)
      .filter($"qid" === 0L).orderBy("rank").collect()
    assert(top(0).getAs[Long]("nid") == 1L) // score 1.0
    assert(top(1).getAs[Long]("nid") == 3L) // score 0.7
  }

  test("ANN/LSH: bucket-restricted results are a subset of brute-force ranking") {
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    val ann = VecOps.annLshTopK(emb, planes = 4, k = 3)
    val brute = VecOps.topK(VecOps.bruteForceScores(emb), 50)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val annPairs = ann.select($"qid", $"nid").as[(Long, Long)].collect()
    // sanity: ANN returns something and every returned neighbor is a real vector
    assert(annPairs.nonEmpty)
    // within-bucket top neighbors should typically be globally good:
    // require ≥50% of ANN picks to land in the global top-50
    val hits = annPairs.count(brute.contains)
    assert(hits * 2 >= annPairs.length, s"hits=$hits of ${annPairs.length}")
  }

  test("matryoshka two-stage: k rows max per query, scores descending, full-dot ranked") {
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    val top = VecOps.matryoshkaTopK(emb, planes = 4, mDims = 16, shortlist = 8, k = 3)
    val rows = top.select($"qid", $"rank", $"nid", $"score")
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.length <= 3, s"qid=$qid returned ${rs.length} rows")
      val byRank = rs.sortBy(_._2)
      val scores = byRank.map(_._4)
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b },
        s"qid=$qid scores not descending")
    }
    // the final score must be the FULL 64-dim dot (re-rank stage), not the
    // truncated prefix dot: recompute one returned pair's dot exactly
    val (qid, _, nid, score) = rows.head
    val full = emb.filter($"vec_id" === qid).crossJoin(
        emb.filter($"vec_id" === nid).select($"embedding".as("ne")))
      .select(VecOps.dot($"embedding", $"ne").as("d")).as[Double].head()
    assert(math.abs(full - score) < 1e-4, s"score $score != full dot $full")
    // and the plan stays a bucket-keyed equi-join
    val plan = top.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("bucketed pair plans contain no cartesian or nested-loop join") {
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    for (directed <- Seq(false, true)) {
      val plan = VecOps.lshScoredPairs(emb, planes = 4, tables = 6, directed = directed)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"quadratic join in bucketed path (directed=$directed)")
    }
  }

  test("multi-table LSH candidates are a strict superset of single-table, subset of all pairs") {
    import spark.implicits._
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    val one = VecOps.lshCandidatePairs(emb, 4, 1, directed = false)
      .as[(Long, Long)].collect().toSet
    val multi = VecOps.lshCandidatePairs(emb, 4, 6, directed = false)
      .as[(Long, Long)].collect().toSet
    assert(one.subsetOf(multi) && multi.size > one.size)
    assert(multi.forall { case (a, b) => a < b })
    val n = emb.count()
    assert(multi.size < n * (n - 1) / 2, "candidates must prune the quadratic pair space")
  }

  test("multi-probe LSH recalls at least as much as single-bucket ANN") {
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    // true 1-NN per query from brute force
    val nn1 = VecOps.topK(VecOps.bruteForceScores(emb), 1)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Int =
      df.select($"qid", $"nid").as[(Long, Long)].collect().count(nn1.contains)
    val single = recall(VecOps.annLshTopK(emb, planes = 4, k = 3))
    val multi = recall(VecOps.annMultiProbeTopK(emb, planes = 4, k = 3))
    assert(multi >= single, s"multi=$multi single=$single")
    assert(multi > 0)
  }

  test("IVF: probed-cell results overlap the brute-force ranking") {
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    val ivf = VecOps.ivfTopK(emb, lists = 16, probes = 2, k = 3)
    val brute = VecOps.topK(VecOps.bruteForceScores(emb), 50)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val picks = ivf.select($"qid", $"nid").as[(Long, Long)].collect()
    assert(picks.nonEmpty)
    val hits = picks.count(brute.contains)
    assert(hits * 2 >= picks.length, s"hits=$hits of ${picks.length}")
    // every query probes ≤ 2 cells → candidate count is bounded by the
    // probed cells' sizes, not n² (the only all-pairs op is the
    // broadcast against 16 centroids — the linear IVF assignment)
    val n = emb.count()
    val cand = VecOps.ivfTopK(emb, 16, 2, Int.MaxValue).count()
    assert(cand < n * (n - 1) / 2)
  }

  test("Lloyd step: k-means objective is non-increasing") {
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    // start from the IVF sampled seeds
    val seeds = emb
      .withColumn("_h", expr("CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .orderBy($"_h", $"vec_id").limit(16)
      .select($"vec_id".as("cid"), $"embedding".as("ce"))
    // objective: Σ ‖v − c(v)‖²; with ‖v‖=1, = Σ (1 − 2·v·c + ‖c‖²)
    def objective(cents: org.apache.spark.sql.DataFrame): Double = {
      graft.functions.DotF32.register(spark)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"vec_id").orderBy($"cd".desc, $"cid")
      emb.select($"vec_id", $"embedding")
        .crossJoin(broadcast(cents))
        .withColumn("cd", expr("dot_f32(embedding, ce)"))
        .withColumn("cc", expr("dot_f32(ce, ce)"))
        .withColumn("crank", row_number().over(w)).filter($"crank" === 1)
        .select(sum(lit(1.0) - lit(2.0) * $"cd" + $"cc"))
        .head().getDouble(0)
    }
    val before = objective(seeds)
    val c1 = VecOps.lloydStep(emb, seeds)
    assert(c1.count() <= 16 && c1.head().getSeq[Float](1).length == 64)
    val mid = objective(c1)
    val c2 = VecOps.lloydStep(emb, c1)
    val after = objective(c2)
    assert(mid <= before + 1e-9, s"step1 $before -> $mid")
    assert(after <= mid + 1e-9, s"step2 $mid -> $after")
  }

  test("hierAssign preserves every input vector on the fixture corpus") {
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    val cent = VecOps.seedCentroids(emb, 16)
    val assigned = VecOps.hierAssign(emb, VecOps.hierIndex(cent))
    assert(assigned.count() == emb.count())
    assert(assigned.filter($"cid".isNull).count() == 0)
  }

  test("hierAssign fails loudly when both probed coarse cells are empty") {
    // Adversarial centroid table (VERDICT r12 #6): anchor A has a huge
    // norm, so every fine centroid's nearest ANCHOR is A (unnormalized
    // dots) — cells B/C/D end up with zero fine members. A query vector
    // anti-aligned with A probes two EMPTY cells; before round 13 it
    // silently vanished from the assignment, now the folded assert_true
    // raises instead.
    def v(pairs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f); pairs.foreach { case (i, x) => a(i) = x }; a
    }
    val cent = Seq(
      (1L, v(0 -> 10.0f)),
      (2L, v(0 -> 1.0f, 1 -> 0.5f)),
      (3L, v(0 -> 1.0f, 2 -> 0.5f)),
      (4L, v(0 -> 1.0f, 3 -> 0.5f))
    ).toDF("cid", "ce")
    val idx = VecOps.hierIndex(cent) // k=4 -> g=4: every centroid is an anchor
    // all four fine centroids map to anchor 1 (dot with the big vector wins)
    assert(idx.f2g.select($"gid").distinct().as[Long].collect().toSeq == Seq(1L))
    val x = Seq((99L, v(0 -> -1.0f, 1 -> 1.0f, 2 -> 1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] { VecOps.hierAssign(x, idx).collect() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("hierAssign"), s"unexpected failure: $msgs")
  }

  test("two-level build: deterministic, 64-dim, corpus-preserving, balance-bounded") {
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    val a = VecOps.twoLevelCentroids(emb).orderBy("cid").collect()
    val b = VecOps.twoLevelCentroids(emb).orderBy("cid").collect()
    assert(a.nonEmpty && a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0) && x.getSeq[Float](1) == y.getSeq[Float](1))
    }
    assert(a.head.getSeq[Float](1).length == 64)
    // the consumer routing over the build preserves every vector and the
    // per-cell mass rule (k_c = ceil(m_c/128)) keeps cells bounded
    val asg = VecOps.hierAssign(emb,
      VecOps.hierIndex(VecOps.twoLevelCentroids(emb).localCheckpoint()))
    assert(asg.count() == emb.count())
    val maxCell = asg.groupBy("cid").count().agg(max("count")).head().getLong(0)
    assert(maxCell <= 8L * VecOps.TargetCellSize, s"max cell $maxCell")
  }

  test("LSH buckets are deterministic across runs") {
    val emb = graft.Tables(spark, sf("sf0.001")).embeddings
    val b1 = VecOps.lshBucket(emb, 4).select("vec_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b2 = VecOps.lshBucket(emb, 4).select("vec_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b1 == b2)
    assert(b1.values.toSet.size > 1) // actually spreads across buckets
  }
}
