package graft.text

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The iterative min-label propagation (the near-dup clustering engine
  * behind neardup_dup_groups / neardup_keep_by_quality) checked against
  * a plain union-find reference on ScalaCheck-generated random graphs —
  * chains, cliques, and sparse noise, including shapes with diameter
  * far above the fixture's near-clique clusters. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    style <- Gen.oneOf("sparse", "chain", "clique")
    edges <- style match {
      case "chain" => // one long path: worst-case diameter for propagation
        // (propagation needs ~diameter rounds — beyond the default
        // maxRounds=30 sized for near-clique dedup clusters, so the
        // call below raises the cap; non-convergence THROWS, never
        // returns wrong labels)
        val len = math.min(n, 35)
        Gen.const((0L until len.toLong).sliding(2).collect {
          case Seq(a, b) => (a, b) }.toList)
      case "clique" =>
        val k = math.min(n, 12).toLong
        Gen.const((for (a <- 0L until k; b <- a + 1 to k - 1) yield (a, b)).toList)
      case _ =>
        Gen.listOfN(n, for {
          a <- Gen.choose(0L, 40L); b <- Gen.choose(0L, 40L) if a != b
        } yield (math.min(a, b), math.max(a, b)))
    }
  } yield edges

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize: every node maps to the MIN node id of its component
    val roots = parent.keys.map(n => n -> find(n)).toMap
    val minOfRoot = roots.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    roots.map { case (n, r) => n -> minOfRoot(r) }
  }

  test("min-label propagation equals union-find on random graphs") {
    samples(edgesGen, 10).filter(_.nonEmpty).foreach { edges =>
      val df = edges.toDF("doc_a", "doc_b")
      val got = TextOps.connectedComponents(df, maxRounds = 100)
        .as[(Long, Long)].collect().toMap // (node, label)
      val want = unionFind(edges)
      assert(got == want,
        s"CC diverged on ${edges.take(8)}…: got ${got.toSeq.sorted.take(8)} " +
          s"want ${want.toSeq.sorted.take(8)}")
    }
  }

  test("jump mode equals union-find on random graphs") {
    samples(edgesGen, 10).filter(_.nonEmpty).foreach { edges =>
      val df = edges.toDF("doc_a", "doc_b")
      val got = TextOps.connectedComponents(df, maxRounds = 100, jump = true)
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(edges), s"jump-CC diverged on ${edges.take(8)}…")
    }
  }

  test("jump mode converges on a diameter-200 chain within O(log d) rounds") {
    // plain propagation needs ~200 rounds here; pointer jumping must fit
    // comfortably inside 30 (observed need: ~10) — this is the shape the
    // 10× phash Hamming graph produced, which blew the plain-mode guard
    val chain = (0L until 200L).sliding(2).collect {
      case Seq(a, b) => (a, b) }.toList
    val got = TextOps.connectedComponents(chain.toDF("doc_a", "doc_b"),
      maxRounds = 30, jump = true).as[(Long, Long)].collect().toMap
    assert(got == unionFind(chain))
  }

  test("reliable-checkpoint mode yields identical labels and bounded snapshots") {
    // the executor-loss-safe path (per-round parquet snapshots under
    // graft.cc.checkpointDir) must be semantically invisible — same
    // labels as localCheckpoint on the same graphs
    val ckptBase = java.nio.file.Files
      .createTempDirectory("cc-reliable-spec").toString
    spark.conf.set("graft.cc.checkpointDir", ckptBase)
    try {
      samples(edgesGen, 3).filter(_.nonEmpty).foreach { edges =>
        val df = edges.toDF("doc_a", "doc_b")
        val local = TextOps.connectedComponents(df, maxRounds = 100)
          .as[(Long, Long)].collect().toMap
        val rel = TextOps.connectedComponents(df, maxRounds = 100, reliable = true)
          .as[(Long, Long)].collect().toMap
        assert(rel == local, s"reliable-mode labels diverged on ${edges.take(8)}…")
      }
      // intermediate rounds + edges are reclaimed as the iteration
      // advances (the round-7 ADVICE fix): after a run, exactly ONE run
      // dir with ONE final labels snapshot remains — not one per round
      val runs = java.nio.file.Files.list(java.nio.file.Paths.get(ckptBase))
      val runDirs = try {
        val it = runs.iterator(); val b = Seq.newBuilder[java.nio.file.Path]
        while (it.hasNext) b += it.next(); b.result()
      } finally runs.close()
      assert(runDirs.size == 1,
        s"expected one surviving run dir (prior runs reclaimed), got $runDirs")
      val inner = java.nio.file.Files.list(runDirs.head)
      val snaps = try {
        val it = inner.iterator(); val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().getFileName.toString; b.result()
      } finally inner.close()
      assert(snaps.size == 1 && snaps.head.startsWith("labels-"),
        s"expected only the final labels snapshot, got $snaps")
    } finally spark.conf.unset("graft.cc.checkpointDir")
  }

  test("skewed star: one hub joined to every doc converges without blowup") {
    // the corpus-dedup nightmare shape — a boilerplate "hub" document
    // near-dups EVERYTHING, so one node carries the full edge list and
    // every propagation round hits that hot key. Diameter is 2, so the
    // round count must stay tiny (maxRounds = 5 would throw otherwise —
    // non-convergence throws, never returns wrong labels) and all nodes
    // must collapse to the hub-component min label.
    val n = 2000L
    val star = (1L to n).map(i => (0L, i)).toDF("doc_a", "doc_b")
    val labels = TextOps.connectedComponents(star, maxRounds = 5)
      .as[(Long, Long)].collect()
    assert(labels.length == n + 1)
    assert(labels.forall(_._2 == 0L), "every spoke must adopt the hub's label")

    // same shape, hub id NOT the minimum: the min label must still reach
    // every spoke THROUGH the hub (two hops) within the round cap
    val star2 = (0L until n).filter(_ != 500L).map(i => (500L, i))
      .toDF("doc_a", "doc_b")
    val labels2 = TextOps.connectedComponents(star2, maxRounds = 5)
      .as[(Long, Long)].collect()
    assert(labels2.forall(_._2 == 0L), "min label must propagate via the hub")
  }
}
