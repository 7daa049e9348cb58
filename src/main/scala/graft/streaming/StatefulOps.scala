package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-state streaming operators (SURVEY.md §2.9): running per-key
  * counters via flatMapGroupsWithState. State is one long per key, held in
  * the executor state store — bounded by key cardinality, not stream
  * length; each micro-batch emits the updated totals for keys it saw. */
object StatefulOps {

  /** Running event counts per key. Works on both a streaming and a batch
    * Dataset (batch: a single "micro-batch" with empty initial state, so
    * the result equals a plain groupBy count — the equivalence the test
    * suite asserts). */
  def runningCountsByKey(df: DataFrame, keyCol: String): Dataset[(Long, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((key, n))
      }
  }
}
