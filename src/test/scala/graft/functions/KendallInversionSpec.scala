package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the Knight inversion aggregator: (1) the merge-sort count
  * equals the O(d²) discordant-pair definition (strict dx·dy < 0 as
  * unordered pairs), ties included; (2) the count is invariant to reduce
  * order and merge association — the partial/final-aggregate law.
  * (Pure JVM: reduce/merge/finish are plain functions.) */
class KendallInversionSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(977L + i)))

  // small value domains to force heavy x-, y- and (x,y)-tie pressure
  private val rowsGen: Gen[List[XyPair]] = for {
    n <- Gen.choose(0, 300)
    rows <- Gen.listOfN(n, for {
      x <- Gen.choose(-6L, 6L)
      y <- Gen.choose(-6L, 6L)
    } yield XyPair(x, y))
  } yield rows

  private def brute(rows: Seq[XyPair]): Long =
    rows.indices.flatMap(i => (i + 1 until rows.size).map(j => (i, j)))
      .count { case (i, j) =>
        (rows(i).x - rows(j).x) * (rows(i).y - rows(j).y) < 0
      }.toLong

  test("merge-sort inversions equal the O(d²) discordant-pair count") {
    val agg = new KendallInversionAggregator
    samples(rowsGen, 25).foreach { rows =>
      val got = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
      assert(got == brute(rows), s"diverged on ${rows.take(20)}…")
    }
  }

  test("count is invariant to reduce order and merge association") {
    val agg = new KendallInversionAggregator
    samples(rowsGen, 12).foreach { rows =>
      val expected = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
      val (p1, rest) = rows.splitAt(rows.length / 3)
      val (p2, p3) = rest.splitAt(rest.length / 2)
      def part(r: Seq[XyPair]) = r.foldLeft(agg.zero)(agg.reduce)
      val a = agg.finish(
        agg.merge(agg.merge(part(p1.reverse), part(p3)), part(p2.reverse)))
      val b = agg.finish(
        agg.merge(part(p2), agg.merge(part(p3.reverse), part(p1))))
      assert(a == expected && b == expected,
        s"merge-order divergence: $a / $b vs $expected")
    }
  }

  test("knight identity: nc = n0 - tx - ty + txy - nd reconstructs tau terms") {
    val agg = new KendallInversionAggregator
    samples(rowsGen, 12).filter(_.nonEmpty).foreach { rows =>
      val d = rows.size.toLong
      val n0 = d * (d - 1) / 2
      def tiePairs[K](key: XyPair => K): Long =
        rows.groupBy(key).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
      val (tx, ty, txy) =
        (tiePairs(_.x), tiePairs(_.y), tiePairs(p => (p.x, p.y)))
      val nd = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
      val ncBrute = rows.indices
        .flatMap(i => (i + 1 until rows.size).map(j => (i, j)))
        .count { case (i, j) =>
          (rows(i).x - rows(j).x) * (rows(i).y - rows(j).y) > 0
        }.toLong
      assert(n0 - tx - ty + txy - nd == ncBrute)
    }
  }
}
