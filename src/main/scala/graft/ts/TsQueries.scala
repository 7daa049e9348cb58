package graft.ts

import graft.{Reg, Tables}
import org.apache.spark.sql.functions._

/** Graded time-series queries (SURVEY.md §2.4/§2.5): the reference tsdb's
  * candle/gap/validation surface over the `events` stream table. */
object TsQueries {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  val all: Seq[Reg] = Seq(

    Reg("candles_1h",
      (s, dir) => TimeSeries.candles(Tables(s, dir).events, "hour")
        .select(
          date_format(col("bucket"), fmt).as("bucket"),
          col("series").as("event_type"),
          col("open"), col("high"), col("low"), col("close"),
          round(col("volume"), 4).as("volume"),
          col("trades"))
        .orderBy("bucket", "event_type"),
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
               event_type,
               arg_min(value, ts) AS open,
               max(value) AS high,
               min(value) AS low,
               arg_max(value, ts) AS close,
               round(sum(value), 4) AS volume,
               count(*) AS trades
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
      """))
  )
}
