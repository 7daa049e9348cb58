package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Order-independence proof for the incremental edit-distance pipeline
  * (`streaming_editdist_pairs`): a pair is discovered in the batch where
  * its LATER-arriving token lands (new variants join the full index), so
  * the final pair set must not depend on how the token universe is split
  * into micro-batches. The graded query streams range-partitioned files
  * (tokens in lexical order); this spec feeds the same core
  * HASH-partitioned files — tokens interleaved across batches — and
  * asserts equality with the batch `editdist1_pairs` result.
  */
class StreamingEditDistSpec extends SparkSpec {

  test("incremental editdist equals batch under interleaved-token batches") {
    val dir = sf("sf0.001")
    val src = java.nio.file.Files
      .createTempDirectory("graft_editdist_spec").toString
    graft.Tables(spark, dir).part
      .select(explode(split(col("p_name"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .repartition(3, col("tok"))
      .write.mode("overwrite").parquet(src)

    val streamed = StreamQueries
      .editdistIncrementalRun(spark, dir, src, "spec_interleaved")
      .collect().toSeq
    val batch = graft.SparkEntry.queries("editdist1_pairs")(spark, dir)
      .collect().toSeq

    assert(streamed.nonEmpty, "incremental editdist returned no rows")
    assert(streamed == batch,
      "incremental (interleaved batches) and batch editdist diverge")
  }
}
