package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query definitions live per domain: graft.ts / graft.rel / graft.text /
  * graft.vec ([[Reg]] carries Spark fn + DuckDB oracle SQL). */
object SparkEntry {

  private def registry: Seq[Reg] =
    graft.ts.TsQueries.all ++
      graft.rel.RelQueries.all ++
      graft.text.TextQueries.all ++
      graft.vec.VecQueries.all ++
      graft.mm.MmQueries.all ++
      graft.streaming.StreamQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hourly OHLCV candles over events — the reference tsdb's defining
    * computation (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    queries("candles_1h")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(r => r.name -> r.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(r => r.oracle.map(sql => r.name -> sql.trim)).toMap
}
