package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Order-independence proof for the online DSIR screen
  * (`streaming_dsir_weights`): every piece of screen state is additive —
  * per-bucket source-split counts and per-(doc, bucket) token counts sum
  * across micro-batches to exactly the batch aggregates — and the
  * log-ratio table derives from the final counts at read-out, so the
  * result must not depend on batching or arrival order. The graded query
  * streams range-partitioned files (ids in order); this spec feeds
  * HASH-partitioned files — ids interleaved across batches — and asserts
  * bit-equality with the batch `dsir_importance_weights` query.
  */
class StreamingDsirSpec extends SparkSpec {

  test("online DSIR weights equal batch under interleaved-id batches") {
    val dir = sf("sf0.001")
    val docs = Tables(spark, dir).documents
    val src = java.nio.file.Files
      .createTempDirectory("graft_dsir_spec").toString
    docs.repartition(3, col("doc_id")).write.mode("overwrite").parquet(src)

    val streamed = StreamQueries
      .dsirIncrementalRun(spark, dir, src, "spec_interleaved")
      .collect().toSeq
    val batch = graft.SparkEntry.queries("dsir_importance_weights")(spark, dir)
      .collect().toSeq

    assert(streamed.nonEmpty, "online DSIR returned no rows")
    assert(streamed == batch,
      "online (interleaved batches) and batch DSIR weights diverge")
  }
}
