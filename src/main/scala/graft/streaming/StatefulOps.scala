package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Per-series gap alarm via transformWithState with EVENT-TIME TIMERS —
    * the live-tsdb "data stopped flowing" monitor, and the op that
    * exercises the timer half of the arbitrary-state API. Two alarm paths:
    *
    *  - "mid": a successor event arrives more than `gapUs` after its
    *    predecessor → the predecessor's gap is alarmed at detection time
    *    (deterministic under replay: depends only on the data order).
    *  - "final": no successor ever arrives — the per-key timer, re-armed
    *    at lastTs+gap on every batch, fires once the event-time watermark
    *    passes it and the alarm is emitted from handleExpiredTimer. The
    *    emitted set is watermark-deterministic: finals fire iff
    *    last_ts + gap <= final watermark (= max(ts) − delay).
    *
    * Replay contract (what makes the op DuckDB-oracle-able): the graded
    * fixture arrives in ONE micro-batch (single parquet file source), so
    * mid-gaps are all detected before any timer can fire. On a live
    * multi-batch stream a mid-gap whose successor arrives only after the
    * watermark passed lastTs+gap alarms TWICE (final, then mid when data
    * resumes) — that is the correct live-monitoring semantics, covered by
    * the controlled-epoch GapAlarmSpec. State: one long per series. */
  class GapAlarmProcessor(gapUs: Long)
      extends StatefulProcessor[String, (String, java.sql.Timestamp, Long), (String, Long, String)] {
    @transient private var last: ValueState[Long] = _ // last event ts, µs

    private def expiryMs(lastUs: Long): Long = lastUs / 1000 + gapUs / 1000

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Long]("last", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, java.sql.Timestamp, Long)],
                                 timerValues: TimerValues): Iterator[(String, Long, String)] = {
      // sort within the micro-batch (bounded by per-key batch size) so
      // gap detection is shuffle-arrival-order independent
      val ts = rows.map(_._3).toArray.sorted
      var prev = if (last.exists()) Some(last.get()) else None
      // re-arm: drop the timer guarding the previous batch's tail event
      prev.foreach(p => getHandle.deleteTimer(expiryMs(p)))
      val out = Seq.newBuilder[(String, Long, String)]
      for (t <- ts) {
        prev.foreach(p => if (t - p > gapUs) out += ((key, p, "mid")))
        prev = Some(t)
      }
      prev.foreach { p =>
        last.update(p)
        getHandle.registerTimer(expiryMs(p))
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[(String, Long, String)] =
      // guard against a stale timer from a superseded tail event (delete
      // + watermark advance can race within one batch)
      if (last.exists() && expiryMs(last.get()) == expiredTimerInfo.getExpiryTimeInMs)
        Iterator((key, last.get(), "final"))
      else Iterator.empty
  }

  /** Timer-closed SESSIONS via transformWithState — true streaming
    * sessionization without session_window: a session closes either when
    * a later event of the same key breaks the gap (emitted at detection,
    * deterministic from the data) or when the event-time watermark passes
    * last_ts + gap and the per-key timer fires (the "user went away"
    * close). State per key = one open session (start, last, count); the
    * same delete/re-arm + stale-timer guard discipline as
    * [[GapAlarmProcessor]]. Emitted set is watermark-deterministic:
    * non-final sessions always emit, each key's final session emits iff
    * last + gap <= final watermark. */
  class TimerSessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long), (Long, Long, Long, Long)] {
    @transient private var sess: ValueState[(Long, Long, Long)] = _ // (startUs, lastUs, n)

    private def expiryMs(lastUs: Long): Long = lastUs / 1000 + gapUs / 1000

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long, Long)]("sess",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
                                 timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
      val ts = rows.map(_._3).toArray.sorted
      var cur = if (sess.exists()) Some(sess.get()) else None
      cur.foreach { case (_, last, _) => getHandle.deleteTimer(expiryMs(last)) }
      val out = Seq.newBuilder[(Long, Long, Long, Long)]
      for (t <- ts) {
        cur match {
          case Some((start, last, n)) if t - last > gapUs =>
            out += ((key, start, last, n)) // gap broken by data: close
            cur = Some((t, t, 1L))
          case Some((start, _, n)) => cur = Some((start, t, n + 1))
          case None => cur = Some((t, t, 1L))
        }
      }
      cur.foreach { c =>
        sess.update(c)
        getHandle.registerTimer(expiryMs(c._2))
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] =
      if (sess.exists() && expiryMs(sess.get()._2) == expiredTimerInfo.getExpiryTimeInMs) {
        val (start, last, n) = sess.get()
        sess.clear()
        Iterator((key, start, last, n))
      } else Iterator.empty
  }

  /** events(user_id, ts) → (user_id, startUs, lastUs, n) closed sessions;
    * `delay` is the watermark delay gating timer-fired (final) closes. */
  def timerSessions(df: DataFrame, gapUs: Long, delay: String): Dataset[(Long, Long, Long, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .transformWithState(new TimerSessionProcessor(gapUs), TimeMode.EventTime(), OutputMode.Update())
  }

  /** events(event_type, ts) → (series, lastEventMicros, "mid"|"final")
    * alarm rows; `delay` is the watermark delay gating final alarms. */
  def gapAlarms(df: DataFrame, gapUs: Long, delay: String): Dataset[(String, Long, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.withWatermark("ts", delay)
      .select(col("event_type"), col("ts"), unix_micros(col("ts")))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .transformWithState(new GapAlarmProcessor(gapUs), TimeMode.EventTime(), OutputMode.Update())
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

  /** Per-key running counts that EXPIRE on an EVENT-TIME TIMEOUT via
    * flatMapGroupsWithState(EventTimeTimeout) — the classic fMGWS
    * idle-key close, covering the timeout corner of the OLDER
    * arbitrary-state API (timers in the transformWithState API are
    * [[GapAlarmProcessor]]). When the watermark passes last-seen +
    * idleMs the key emits one final ("expired") row and its state is
    * REMOVED — state stays bounded by the live-key set, not the
    * all-time key space. Input needs `tsCol` for the watermark. */
  def expiringCountsByKey(df: DataFrame, keyCol: String, tsCol: String,
                          delay: String, idleMs: Long): Dataset[(Long, Long, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    // the watermark-carrying timestamp COLUMN must survive into the
    // grouped Dataset (projecting it away fails the streaming checker)
    df.withWatermark(tsCol, delay)
      .select(col(keyCol).cast("long"), col(tsCol))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, String)](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            val (n, _) = state.get
            state.remove()
            Iterator((key, n, "expired"))
          } else {
            val batch = rows.toSeq
            val (n0, last0) = state.getOption.getOrElse((0L, 0L))
            val n = n0 + batch.size
            val last = math.max(last0, batch.map(_._2.getTime).max)
            state.update((n, last))
            state.setTimeoutTimestamp(last + idleMs)
            Iterator((key, n, "active"))
          }
      }
  }
}
