package graft.vec

import graft.{SparkEntry, SparkSpec}

/** Lifecycle guards for `ann_persisted_index_topk` beyond the DuckDB
  * grade: the on-disk index must actually be bucket-partitioned (the
  * partition-pruning claim rests on the layout), and a re-invocation
  * must wipe + rebuild deterministically — the graded result can never
  * depend on a previous run's store. */
class PersistedIndexSpec extends SparkSpec {

  test("index store is bucket-partitioned and rebuilds identically") {
    val dir = sf("sf0.001")
    def run() = SparkEntry.queries("ann_persisted_index_topk")(spark, dir)
      .collect().map(_.toString).toSeq

    val first = run()
    assert(first.nonEmpty)

    // the store key mirrors the query's fixture-identity derivation
    val src = java.nio.file.Paths.get(dir, "embeddings.parquet")
    val key = graft.sources.Fixtures.md5Hex(dir + "|" +
      java.nio.file.Files.getLastModifiedTime(src).toMillis + "|" +
      java.nio.file.Files.size(src))
    val store = java.nio.file.Paths.get(s"/dev/shm/graft-annidx/$key")
    assert(java.nio.file.Files.isDirectory(store), s"store missing: $store")
    val buckets = java.nio.file.Files.list(store).toArray.map(_.toString)
      .filter(_.contains("bucket="))
    assert(buckets.nonEmpty,
      s"store is not bucket-partitioned: ${java.nio.file.Files.list(store).toArray.toSeq}")

    // second invocation wipes and rebuilds; result must be identical
    assert(run() == first, "rebuild diverged from the first build")
  }
}
