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
}
