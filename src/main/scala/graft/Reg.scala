package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark implementation + (when SQL-expressible) the
  * equivalent DuckDB oracle SQL the driver hash-compares against.
  *
  * Determinism contract (SURVEY.md §5, grading is exact hash-match):
  *  - total-order ORDER BY (tie-broken by a key column) on both sides;
  *  - float aggregates rounded identically on both sides;
  *  - timestamp OUTPUT columns stringified (`date_format` ↔ `strftime`) —
  *    Spark writes session-UTC instants as UTC-adjusted parquet while the
  *    oracle sees naive timestamps, so raw timestamp outputs can't be
  *    hash-compared safely;
  *  - min_by/max_by ↔ arg_min/arg_max, never first()/last().
  */
final case class Reg(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
