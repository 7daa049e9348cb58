package graft.text

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Completeness laws of the candidate generation behind
  * `jaccard_prefix_join` (pure JVM — the properties are about the math,
  * not the plan), mirroring the query's exact integer formulas:
  *
  *  1. Prefix filtering (Bayardo et al., WWW'07): under ANY shared total
  *     order, two sets with Jaccard >= 0.7 must share an element inside
  *     each one's first l − ⌈0.7·l⌉ + 1 elements. The query's prefix
  *     bound is `rn <= l - ((7l + 9) div 10) + 1`.
  *  2. PPJoin positional filter (Xiao et al., WWW'08): the upper bound
  *     ub = max over shared prefix positions of 1 + min(la − rn_a,
  *     lb − rn_b) never drops a true pair under the query's keep rule
  *     `ub * 17 >= 7 * (la + lb)` (⇔ overlap threshold
  *     α = ⌈7(la+lb)/17⌉ for t = 0.7).
  *
  * Together: the equi-join + positional prune can only lose FALSE
  * candidates; the exact array_intersect verify does the rest.
  */
class PrefixJoinSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(431L + i)))

  // small universe so Jaccard >= 0.7 pairs actually occur; the global
  // order is df-ascending with symbol tiebreak, exactly like the query
  private val setGen: Gen[Set[Int]] = for {
    n <- Gen.choose(2, 10)
    xs <- Gen.listOfN(n, Gen.choose(0, 11))
  } yield xs.toSet

  private def jaccardGE07(a: Set[Int], b: Set[Int]): Boolean = {
    val inter = a.intersect(b).size
    inter * 10 >= (a.size + b.size - inter) * 7
  }

  private case class Ranked(order: Map[Int, Int]) {
    // 1-based rank of x in a set's own df-ascending ordering
    def rn(s: Set[Int], x: Int): Int =
      s.toSeq.sortBy(order).indexOf(x) + 1
    def prefixLen(l: Int): Int = l - ((7 * l + 9) / 10) + 1
    def prefix(s: Set[Int]): Seq[Int] =
      s.toSeq.sortBy(order).take(prefixLen(s.size))
  }

  private def rankedOf(sets: Seq[Set[Int]]): Ranked = {
    val df = sets.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val ordered = df.keys.toSeq.sortBy(x => (df(x), x))
    Ranked(ordered.zipWithIndex.toMap)
  }

  test("Jaccard >= 0.7 pairs always share a prefix element") {
    val sets = samples(setGen, 600)
    val r = rankedOf(sets)
    val close = for {
      i <- sets.indices; j <- (i + 1) until sets.size
      if jaccardGE07(sets(i), sets(j))
    } yield (sets(i), sets(j))
    assert(close.size > 100, s"generator produced only ${close.size} close pairs")
    close.foreach { case (a, b) =>
      assert(r.prefix(a).toSet.intersect(r.prefix(b).toSet).nonEmpty,
        s"prefix filter would miss ($a, $b)")
    }
  }

  test("positional upper bound keeps every Jaccard >= 0.7 pair") {
    val sets = samples(setGen, 600)
    val r = rankedOf(sets)
    val close = for {
      i <- sets.indices; j <- (i + 1) until sets.size
      if jaccardGE07(sets(i), sets(j))
    } yield (sets(i), sets(j))
    close.foreach { case (a, b) =>
      val shared = r.prefix(a).toSet.intersect(r.prefix(b).toSet)
      val ub = shared.map(x =>
        1 + math.min(a.size - r.rn(a, x), b.size - r.rn(b, x))).max
      assert(ub * 17 >= 7 * (a.size + b.size),
        s"positional filter would drop true pair ($a, $b): ub=$ub")
    }
  }

  test("positional upper bound really bounds the intersection") {
    val sets = samples(setGen, 400)
    val r = rankedOf(sets)
    for {
      i <- sets.indices; j <- (i + 1) until sets.size
      a = sets(i); b = sets(j)
      shared = r.prefix(a).toSet.intersect(r.prefix(b).toSet)
      if shared.nonEmpty
    } {
      val ub = shared.map(x =>
        1 + math.min(a.size - r.rn(a, x), b.size - r.rn(b, x))).max
      assert(a.intersect(b).size <= ub,
        s"ub=$ub underestimates |∩|=${a.intersect(b).size} for ($a, $b)")
    }
  }
}
