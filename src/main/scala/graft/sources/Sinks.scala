package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink surface (SURVEY.md §2.1): Parquet (canonical storage), partitioned
  * layouts (the 100 TB path: directory partitioning by low-cardinality
  * keys gives free partition pruning on read), and CSV (the reference's
  * serving format — its REST layer returned candle ranges as CSV;
  * reference v0 snapshot is empty, semantics per SURVEY.md §1.4).
  */
object Sinks {

  /** Canonical single-dataset parquet write. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Directory-partitioned parquet: `path/col=value/...`. Reads with a
    * filter on the partition columns prune directories at planning time —
    * this is the layout a 100 TB events table would use (partition by
    * date + series). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** CSV with header — the reference's serving format. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSON-lines — the interchange format LLM-pipeline corpora ship in. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — Spark's other native columnar format; schema is self-describing
    * (typed read-back needs no explicit schema, unlike CSV/JSONL). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
}
