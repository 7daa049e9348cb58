package graft.text

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence law behind `bpe_learn_merges`: the Spark side merges a
  * chosen pair (a,b) with an `aggregate` HOF fold (append, or replace the
  * accumulated LAST symbol when (last, current) == (a, b)), while the
  * DuckDB oracle walks positions in a recursive CTE (emit syms[pos] and
  * advance +1, or emit a||b and advance +2 on a match). Both must realize
  * the SAME greedy left-to-right non-overlapping merge — including the
  * overlap trap ('a','a') over "aaa" (merge positions 0-1, NOT 1-2) and
  * merged-symbol collisions (a freshly produced a||b that equals a and is
  * followed by b must merge again, e.g. pair (x, xy) is impossible but
  * (xy, z) after producing xy must fire).
  *
  * Property: fold(syms) == walk(syms) for random symbol sequences over a
  * tiny alphabet (maximizing adjacent repeats) and every candidate pair.
  */
class BpeGreedySpec extends AnyFunSuite {

  /** The `aggregate` lambda, verbatim in Scala. */
  private def fold(syms: Vector[String], a: String, b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b)
        acc.init :+ (a + b)
      else acc :+ x
    }

  /** The recursive-CTE position walk, verbatim in Scala. */
  private def walk(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var pos = 0
    while (pos < syms.length) {
      if (syms(pos) == a && pos + 1 < syms.length && syms(pos + 1) == b) {
        out += (a + b); pos += 2
      } else { out += syms(pos); pos += 1 }
    }
    out.result()
  }

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(977L + i)))

  test("fold merge == position-walk merge on random sequences, all pairs") {
    val sym = Gen.oneOf("a", "b", "ab", "ba", "aa")
    val seqGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, sym).map(_.toVector))
    val pairs = for (a <- Seq("a", "b", "ab", "aa"); b <- Seq("a", "b", "ab")) yield (a, b)
    var checked = 0
    samples(seqGen, 400).foreach { syms =>
      pairs.foreach { case (a, b) =>
        assert(fold(syms, a, b) == walk(syms, a, b),
          s"diverged on syms=$syms pair=($a,$b): " +
            s"fold=${fold(syms, a, b)} walk=${walk(syms, a, b)}")
        checked += 1
      }
    }
    assert(checked > 3000)
  }

  test("the overlap trap: ('a','a') over aaa merges left-to-right only") {
    assert(fold(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(walk(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(fold(Vector("a", "a", "a", "a"), "a", "a") == Vector("aa", "aa"))
  }

  test("merged output joining a following b re-fires exactly like the walk") {
    // pair (xy, z): [x?] no — produced symbols can re-participate as `a`
    val syms = Vector("xy", "z", "xy", "xy", "z")
    assert(fold(syms, "xy", "z") == walk(syms, "xy", "z"))
    assert(fold(syms, "xy", "z") == Vector("xyz", "xy", "xyz"))
  }
}
