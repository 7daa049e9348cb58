package graft.mm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Property checks for the round-11 operators, each against an
  * INDEPENDENT direct implementation (the Round10StatsSpec discipline:
  * the graded oracle proves Spark ≡ DuckDB; these prove both ≡ the
  * textbook definition).
  *
  *  - phash32 vs a per-string Scala reference of the block-energy hash;
  *  - hammingPairs' pigeonhole EXACT-recall contract vs brute force;
  *  - Durbin-Levinson PACF (the generated unrolled SQL) vs a direct
  *    Scala recursion on the same micros-quantized ACF inputs;
  *  - Cohen's kappa identities (perfect agreement ⇒ κ = 1; κ ≤ p_o).
  */
class Round11Spec extends SparkSpec {

  private def phashRef(text: String): Long = {
    val bytes = text.getBytes("UTF-8").map(_.toLong & 0xffL)
    val len = bytes.length
    val total = bytes.sum
    (0 until 32).map { k =>
      val from = k * len / 32
      val until = (k + 1) * len / 32
      val energy = bytes.slice(from, until).sum
      if (energy * 32 > total) 1L << k else 0L
    }.sum
  }

  test("phash32 matches the direct per-string reference on every doc") {
    val docs = Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        col("text"))
    val got = MultiModal.phash32(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = docs.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, t) =>
      if (t.length >= 32)
        assert(got(id) == phashRef(t), s"phash mismatch for doc $id")
      else assert(!got.contains(id), s"doc $id under 32 bytes must be dropped")
    }
  }

  test("hammingPairs has EXACT recall for hd <= chunks-1 (pigeonhole)") {
    val docs = Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val fps = MultiModal.phash32(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, pa) <- fps; (ib, pb) <- fps
      if ia < ib && java.lang.Long.bitCount(pa ^ pb) <= 3
    } yield (ia, ib)).toSet
    val banded = MultiModal.hammingPairs(MultiModal.phash32(docs),
        chunks = 4, bitsPerChunk = 8, maxHd = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"banding lost/added pairs: missing=${brute -- banded} extra=${banded -- brute}")
    assert(brute.nonEmpty, "fixture should contain at least one hd<=3 pair")
  }

  test("unrolled Durbin-Levinson SQL matches a direct Scala recursion") {
    val df = graft.SparkEntry.queries("acf_pacf_hourly")(spark, sf("sf0.001"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.length == 6)
    val r = rows.map(_.getLong(1).toDouble / 1e6)
    // direct Durbin-Levinson on the same micros-quantized inputs
    var phiPrev = Array(r(0)) // φ_{1,1}
    val pacf = scala.collection.mutable.ArrayBuffer(r(0))
    for (k <- 2 to 6) {
      val num = r(k - 1) - (1 until k).map(j => phiPrev(j - 1) * r(k - j - 1)).sum
      val den = 1.0 - (1 until k).map(j => phiPrev(j - 1) * r(j - 1)).sum
      val pkk = if (den == 0) 0.0 else num / den
      val next = Array.tabulate(k)(i =>
        if (i == k - 1) pkk else phiPrev(i) - pkk * phiPrev(k - 2 - i))
      pacf += pkk
      phiPrev = next
    }
    rows.zipWithIndex.foreach { case (row, i) =>
      val want = math.round(pacf(i) * 1e6)
      // the SQL tree and this fold may differ by one ulp before rounding —
      // allow the +-1 micro boundary case, nothing more
      assert(math.abs(row.getLong(2) - want) <= 1,
        s"pacf lag ${i + 1}: sql ${row.getLong(2)} vs direct $want")
    }
    // sanity: PACF lag 1 equals ACF lag 1 by definition
    assert(rows(0).getLong(1) == rows(0).getLong(2))
  }

  test("cohens kappa: identities hold on the graded output") {
    val row = graft.SparkEntry.queries("cohens_kappa_langid")(spark, sf("sf0.001"))
      .collect().head
    val (n, agree, chance) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (po, pe, kappa) = (row.getLong(3), row.getLong(4), row.getLong(5))
    assert(n > 0 && agree <= n && chance <= n * n)
    assert(po == math.round(agree.toDouble / n * 1e6))
    assert(pe == math.round(chance.toDouble / (n.toDouble * n) * 1e6))
    // kappa <= po/1e6 scaled (chance correction can only lower agreement)
    assert(kappa <= po + 1)
    // recompute kappa from the integer parts
    val want =
      if (n * n == chance) 0L
      else math.round((agree * n - chance).toDouble / (n * n - chance).toDouble * 1e6)
    assert(kappa == want)
  }
}
