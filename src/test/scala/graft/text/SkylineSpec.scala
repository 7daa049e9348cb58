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
}
