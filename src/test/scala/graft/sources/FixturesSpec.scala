package graft.sources

import graft.SparkSpec

/** Cache-identity discipline of the derived-fixture layouts (ADVICE r7):
  * scratch keys are full-md5 of the fixture identity, so distinct sf dirs
  * can never collide into one cache entry (the String.hashCode hazard —
  * a 32-bit collision would silently serve the wrong scale factor), and
  * the same dir yields a stable, reusable path. */
class FixturesSpec extends SparkSpec {

  test("embedding stream files: distinct sf dirs get distinct cache dirs; same dir is stable") {
    val a1 = Fixtures.ensureEmbeddingStreamFiles(spark, sf("sf0.001"), n = 3)
    val a2 = Fixtures.ensureEmbeddingStreamFiles(spark, sf("sf0.001"), n = 3)
    val b = Fixtures.ensureEmbeddingStreamFiles(spark, sf("sf0.01"), n = 3)
    assert(a1 == a2, "same fixture identity must reuse its cache dir")
    assert(a1 != b, "different sf dirs must never share a cache dir")
    // the key is the 32-hex md5 of the identity, not a short hash
    assert(a1.split('/').last.matches("[0-9a-f]{32}"), s"non-md5 cache key: $a1")
    // both layouts exist and carry the requested file count
    for (p <- Seq(a1, b)) {
      val parts = new java.io.File(p).listFiles((_, n) => n.endsWith(".parquet"))
      assert(parts != null && parts.length == 3, s"expected 3 part files under $p")
    }
  }

  test("partitioned events: md5-keyed, stable, readable") {
    val p1 = Fixtures.ensurePartitionedEvents(spark, sf("sf0.001"))
    val p2 = Fixtures.ensurePartitionedEvents(spark, sf("sf0.001"))
    assert(p1 == p2)
    assert(p1.split('/').dropRight(1).last.matches("[0-9a-f]{32}"), s"non-md5 key: $p1")
    assert(spark.read.parquet(p1).count() > 0)
  }
}
