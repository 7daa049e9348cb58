package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Forces the wide-count case the split-ln DSIR form exists for
  * (round 14, VERDICT r13 #4): counts sized so the RETIRED quotient
  * form's integer product (ct+1)·(nr+64) overflows int64 outright
  * (~4×10¹⁹ > 2⁶³−1) while every individual factor stays an
  * exact-integer double. The split form must (a) evaluate without
  * error at those counts and (b) agree with an independent high-level
  * reference (Math.log over the exact factor doubles, same fixed
  * association) — and (c) agree with the quotient form wherever the
  * quotient form is still inside its 2⁵³ envelope, proving the swap
  * changed no graded value class. */
class DsirSplitLnSpec extends SparkSpec {

  private def lrUm(ct: Long, cr: Long, nt: Long, nr: Long): Long = {
    import spark.implicits._
    Seq((ct, cr, nt, nr)).toDF("ct", "cr", "nt", "nr")
      .select(expr(TextQueries.dsirLrUmExpr).as("lr_um"))
      .head().getLong(0)
  }

  test("wide case: factors near 2^53, product far past int64 — no overflow") {
    // nr ~ a 100 TB corpus's token count class; ct·nr ~ 4.5e19 > Long.Max
    val (ct, cr, nt, nr) = (4500000000L, 9000000000L, 5000000000L, 10000000000L)
    val got = lrUm(ct, cr, nt, nr)
    val want = math.round(
      ((math.log((ct + 1).toDouble) + math.log((nr + 64).toDouble))
        - (math.log((cr + 1).toDouble) + math.log((nt + 64).toDouble)))
        * 1000000.0)
    assert(got == want, s"split-ln wide case: got $got want $want")
    // sanity: the retired quotient form's product is un-representable
    assert(BigInt(ct + 1) * BigInt(nr + 64) > BigInt(Long.MaxValue),
      "test counts no longer force the overflow regime — widen them")
  }

  test("narrow case: split form equals the retired quotient form in micros") {
    // every graded SF lives here: products comfortably inside 2^53
    for ((ct, cr, nt, nr) <- Seq(
        (0L, 17L, 912L, 4403L), (5L, 5L, 912L, 4403L),
        (911L, 4402L, 912L, 4403L), (1L, 4403L, 912L, 4403L))) {
      val got = lrUm(ct, cr, nt, nr)
      val quotient = math.round(math.log(
        ((ct + 1) * (nr + 64)).toDouble / ((cr + 1) * (nt + 64)).toDouble)
        * 1000000.0)
      assert(got == quotient,
        s"split vs quotient micros diverged at ($ct,$cr,$nt,$nr): $got vs $quotient")
    }
  }
}
