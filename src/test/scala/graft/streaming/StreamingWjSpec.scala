package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Order-independence proof for the incremental weighted-jaccard screen
  * (`streaming_wj_neardup`): candidate coverage rests on df monotonicity
  * — a pair whose shared gram ENDS in the [2, ceiling] band was in-band
  * when its later member arrived, whatever the batching — and the
  * read-out re-scores candidates on the FINAL corpus, so the result must
  * not depend on how documents are split into micro-batches or in what
  * order ids arrive. The graded query streams range-partitioned files
  * (ids in order); this spec feeds HASH-partitioned files — ids
  * interleaved, so every batch after the first carries ids smaller than
  * ids already processed — and asserts bit-equality with the batch
  * `weighted_jaccard_pairs` query.
  */
class StreamingWjSpec extends SparkSpec {

  test("incremental weighted-jaccard equals batch under interleaved-id batches") {
    val dir = sf("sf0.001")
    val docs = Tables(spark, dir).documents
    val src = java.nio.file.Files
      .createTempDirectory("graft_wj_spec").toString
    docs.repartition(3, col("doc_id")).write.mode("overwrite").parquet(src)

    val streamed = StreamQueries
      .wjIncrementalRun(spark, dir, src, "spec_interleaved")
      .collect().toSeq
    val batch = graft.SparkEntry.queries("weighted_jaccard_pairs")(spark, dir)
      .collect().toSeq

    assert(streamed.nonEmpty, "incremental weighted-jaccard returned no rows")
    assert(streamed == batch,
      "incremental (interleaved batches) and batch weighted-jaccard diverge")
  }
}
