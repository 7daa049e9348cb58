package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text / dedup operators for the LLM-data-pipeline surface (SURVEY.md
  * §1.2, §2.10). Everything is deterministic and cross-engine portable:
  * the only hash primitive is md5 (identical in Spark and DuckDB), parsed
  * to a 60-bit non-negative long — never xxhash64/hash (engine-specific)
  * and never random seeds.
  *
  * Scale notes (100 TB): all operators are explode → hash-aggregate
  * pipelines keyed on doc_id or a hash key — map-side combine applies,
  * no driver-side iteration, no broadcast of anything document-sized.
  * MinHash-LSH turns the quadratic near-dup search into an equi-join on
  * band keys (the classic shuffle-friendly formulation).
  */
object TextOps {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** 60-bit non-negative hash from md5 hex — portable to DuckDB as
    * ('0x' || substr(md5(x),1,15))::BIGINT. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(
      transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", slice(t, i + 1, lit(n)))))
  }

  /** docs(doc_id, text) → (doc_id, shingle) exploded, distinct per doc. */
  def explodedShingles(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), explode(shingles(col("text"), n)).as("shingle"))

  /** MinHash signature: k 60-bit hashes, seeded by index (seed is part of
    * the hashed string — portable, no engine RNG). One hash-aggregate. */
  def minhashSignature(sh: DataFrame, k: Int): DataFrame = {
    val mins = (0 until k).map(i =>
      min(hash60(concat(lit(s"mh$i|"), col("shingle")))).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH band keys from a signature: `bands` bands of `rows` hashes each;
    * key = md5 over the band's hash values. Output (doc_id, band_key). */
  def lshBands(sig: DataFrame, bands: Int, rows: Int): DataFrame = {
    val keys = (0 until bands).map { b =>
      md5(concat_ws("_", lit(b.toString) +: (0 until rows).map(r => col(s"h${b * rows + r}")): _*))
    }
    sig.select(col("doc_id"), explode(array(keys: _*)).as("band_key"))
  }

  /** Candidate pairs (a < b) sharing at least one LSH band. */
  def lshCandidates(bandsDf: DataFrame): DataFrame = {
    val l = bandsDf.select(col("doc_id").as("doc_a"), col("band_key"))
    val r = bandsDf.select(col("doc_id").as("doc_b"), col("band_key"))
    l.join(r, "band_key")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact Jaccard over distinct word n-gram shingle sets for given pairs.
    * Shingle sets are collected per doc (bounded: ≤ tokens-per-doc
    * shingles), joined to both sides of the pair — two broadcast-or-shuffle
    * hash joins, then a per-row array intersection. */
  def exactJaccard(pairs: DataFrame, docs: DataFrame, n: Int): DataFrame = {
    val sets = docs.select(col("doc_id"), shingles(col("text"), n).as("sset"))
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("sset").as("set_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sset").as("set_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("set_a")) + size(col("set_b")) - col("inter")))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Near-duplicate pairs: MinHash → LSH banding → exact Jaccard filter.
    * k = bands·rowsPerBand hashes. At 100 TB the band join is the only
    * shuffle that touches all docs, and its fan-out is bounded by bucket
    * collision rates, not the quadratic pair count. */
  def nearDupPairs(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
                   minJaccard: Double): DataFrame = {
    val sig = minhashSignature(explodedShingles(docs, n), bands * rowsPerBand)
    val cand = lshCandidates(lshBands(sig, bands, rowsPerBand))
    exactJaccard(cand, docs, n).filter(col("jaccard") >= minJaccard)
  }

  /** 60-bit SimHash over distinct tokens: bit i of the fingerprint is set
    * iff the sum of ±1 contributions (per-token hash bit i) is positive.
    * Two hash-aggregates over an exploded (doc × token × bit) relation. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(tokens(col("text")))).as("w"))
      .withColumn("hv", hash60(col("w")))
    tok
      .select(col("doc_id"), col("hv"), explode(sequence(lit(0), lit(59))).as("i"))
      .withColumn("contrib", when(expr("(hv >> i) & 1") === 1, 1).otherwise(-1))
      .groupBy(col("doc_id"), col("i"))
      .agg(sum(col("contrib")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END")).as("simhash"))
  }
}
