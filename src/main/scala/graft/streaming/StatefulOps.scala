package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary-state streaming operators (SURVEY.md §2.9): running per-key
  * counters via flatMapGroupsWithState, and a per-series EMA via Spark 4's
  * transformWithState. State is one value per key, held in the executor
  * state store — bounded by key cardinality, not stream length; each
  * micro-batch emits updates for keys it saw. */
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

  /** Per-series exponential moving average via transformWithState — the
    * Spark 4 arbitrary-state API (SURVEY.md §2.9). One double of state
    * per series (the last EMA); rows inside a micro-batch are sorted by
    * event time before applying the recurrence so the result is
    * independent of shuffle arrival order (bounded by per-key batch
    * size, not stream length). Requires the RocksDB state-store provider
    * (see StatefulOpsSpec for the conf). */
  class EmaProcessor(alpha: Double)
      extends StatefulProcessor[String, (String, Long, Double), (String, Long, Double)] {
    @transient private var ema: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ema = getHandle.getValueState[Double]("ema", Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Long, Double)],
                                 timerValues: TimerValues): Iterator[(String, Long, Double)] = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      var cur = if (ema.exists()) Some(ema.get()) else None
      val out = sorted.map { case (series, tsUs, v) =>
        cur = Some(cur.fold(v)(prev => alpha * v + (1 - alpha) * prev))
        (series, tsUs, cur.get)
      }
      cur.foreach(ema.update)
      out.iterator
    }
  }

  /** events(event_type, ts, value) → (series, epochMicros, ema). */
  def emaBySeries(df: DataFrame, alpha: Double): Dataset[(String, Long, Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("event_type"), unix_micros(col("ts")), col("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new EmaProcessor(alpha), TimeMode.None(), OutputMode.Update())
  }
}
