package graft.text

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Completeness law of the SymSpell deletion-neighborhood banding behind
  * `editdist1_pairs` (pure JVM — the property is about the math, not the
  * plan): for ANY two strings within Levenshtein distance 1, their
  * deletion neighborhoods ({s} ∪ one-char-deleted variants) intersect —
  * so the variant-keyed equi-join can never MISS a true pair, and the
  * exact levenshtein post-filter only ever removes false candidates.
  * (Substitution is the subtle case: a→b at position i implies
  * del(a, i) == del(b, i).) */
class EditDistBandingSpec extends AnyFunSuite {

  private def delNbhd(s: String): Set[String] =
    Set(s) ++ s.indices.map(i => s.substring(0, i) + s.substring(i + 1))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(99L + i)))

  // small alphabet so distance-1 pairs actually occur in random draws
  private val strGen: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  test("lev<=1 pairs always share a deletion-neighborhood key") {
    val pairs = samples(Gen.zip(strGen, strGen), 4000)
    val close = pairs.filter { case (a, b) => lev(a, b) <= 1 }
    assert(close.size > 200, s"generator produced only ${close.size} close pairs")
    close.foreach { case (a, b) =>
      assert(delNbhd(a).intersect(delNbhd(b)).nonEmpty,
        s"banding would miss ($a, $b), lev=${lev(a, b)}")
    }
  }

  test("edit operations each stay within one shared key: insert, delete, substitute") {
    for (s <- samples(strGen, 300)) {
      val ins = s.substring(0, s.length / 2) + "x" + s.substring(s.length / 2)
      val del = if (s.length > 1) s.substring(1) else ""
      val sub = "z" + s.substring(1)
      for (t <- Seq(ins, sub) ++ (if (del.nonEmpty) Seq(del) else Nil))
        assert(delNbhd(s).intersect(delNbhd(t)).nonEmpty, s"missed ($s, $t)")
    }
  }
}
