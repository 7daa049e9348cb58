package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Order-independence proof for the online decontamination screen
  * (`streaming_decontam_overlap`): the hit set {(eval doc, gram) : gram
  * in ANY train doc} is a monotone UNION over micro-batches, so the
  * accumulated distinct hits — and therefore the per-eval-doc counts and
  * contamination verdicts — must not depend on how the training corpus
  * is split into batches or in what order documents arrive. The graded
  * query streams range-partitioned files (ids in order); this spec feeds
  * HASH-partitioned files — ids interleaved across batches — and asserts
  * bit-equality with the batch `decontamination_overlap` query.
  */
class StreamingDecontamSpec extends SparkSpec {

  test("online decontamination equals batch under interleaved-id batches") {
    val dir = sf("sf0.001")
    val docs = Tables(spark, dir).documents
    val src = java.nio.file.Files
      .createTempDirectory("graft_decon_spec").toString
    docs.repartition(3, col("doc_id")).write.mode("overwrite").parquet(src)

    val streamed = StreamQueries
      .decontamIncrementalRun(spark, dir, src, "spec_interleaved")
      .collect().toSeq
    val batch = graft.SparkEntry.queries("decontamination_overlap")(spark, dir)
      .collect().toSeq

    assert(streamed.nonEmpty, "online decontamination returned no rows")
    assert(streamed == batch,
      "online (interleaved batches) and batch decontamination diverge")
  }
}
