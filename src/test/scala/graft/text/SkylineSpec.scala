package graft.text

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Correctness law behind `pareto_frontier_docs`: the linear two-window
  * skyline (max y over strictly-greater x via a RANGE frame on the
  * descending key; max y among equal-x ties) must equal the quadratic
  * dominance definition — p is on the frontier iff no q has
  * (x_q ≥ x_p ∧ y_q ≥ y_p) with at least one strict. Duplicate points
  * (both coords equal) dominate nothing and are BOTH kept — the tie
  * window keeps them iff y equals the tie-max, matching the definition.
  */
class SkylineSpec extends AnyFunSuite {

  private def naive(pts: Vector[(Int, Int)]): Set[(Int, Int)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.toSet

  /** The query's window formulation, verbatim in Scala. */
  private def windowed(pts: Vector[(Int, Int)]): Set[(Int, Int)] =
    pts.filter { case (x, y) =>
      val strictlyLonger = pts.filter(_._1 > x).map(_._2)
      val tieMax = pts.filter(_._1 == x).map(_._2).max
      (strictlyLonger.isEmpty || strictlyLonger.max < y) && tieMax == y
    }.toSet

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(613L + i)))

  test("two-window skyline == quadratic dominance on random points") {
    val pt = for (x <- Gen.choose(0, 8); y <- Gen.choose(0, 8)) yield (x, y)
    val ptsGen = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, pt).map(_.toVector))
    samples(ptsGen, 500).foreach { pts =>
      assert(windowed(pts) == naive(pts), s"diverged on $pts")
    }
  }

  test("duplicate frontier points are all kept") {
    val pts = Vector((5, 5), (5, 5), (3, 7))
    assert(windowed(pts) == Set((5, 5), (3, 7)))
    assert(naive(pts) == Set((5, 5), (3, 7)))
  }

  test("incremental skylineInsert fold == full skyline under ANY batch split") {
    // the law streaming_pareto_frontier's state maintenance rests on:
    // folding points one at a time (state = frontier only) reaches the
    // same frontier as computing the skyline of everything at once,
    // whatever order / batching the stream delivers
    val pt = for (x <- Gen.choose(0, 8); y <- Gen.choose(0, 8)) yield (x, y)
    val ptsGen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, pt).map(_.toVector))
    samples(ptsGen, 300).zipWithIndex.foreach { case (pts, i) =>
      // a deterministic shuffle per case: rotate by i
      val rotated = if (pts.isEmpty) pts else pts.drop(i % pts.length) ++ pts.take(i % pts.length)
      val folded = rotated.foldLeft(Vector.empty[(Long, Long, Long)]) { (f, p) =>
        graft.streaming.StatefulOps.skylineInsert(
          f, (f.length.toLong, p._1.toLong, p._2.toLong))
      }
      // compare point SETS (ids differ); duplicates collapse to the same
      // (x, y) in both representations for Set comparison, but first
      // assert multiplicity: #frontier members == #input points that are
      // on the naive frontier is NOT an invariant for duplicates of the
      // same point arriving in different batches — the fold keeps every
      // copy, exactly like the two-window query does
      val naiveSet = naive(pts)
      assert(folded.map(q => (q._2.toInt, q._3.toInt)).toSet == naiveSet,
        s"diverged on $pts (rotated $rotated)")
      val dupCount = pts.count(p => naiveSet.contains(p))
      assert(folded.length == dupCount,
        s"multiplicity diverged on $pts: fold=${folded.length} expected=$dupCount")
    }
  }
}
