package graft.text

import graft.{SparkEntry, SparkSpec}

/** Hand-corpus ground truth for `substring_dup_spans` (the DuckDB oracle
  * grades the fixture corpus; this pins the SEMANTICS on inputs where
  * the expected maximal spans are computable by hand):
  *
  *  - a 10-token run shared across two documents must come back as ONE
  *    merged span per document (three overlapping duplicated 8-grams →
  *    gaps-and-islands fuses them), at each document's own offsets;
  *  - unique surrounding tokens must NOT extend the span;
  *  - within-document repetition (a 4-token phrase tiled 4×) must be
  *    caught too — per Lee et al., self-repetition is duplication, and
  *    every 8-gram of the tiling occurs at distance 4 from its twin.
  */
class SubstringDupSpec extends SparkSpec {

  test("shared 10-token run merges to one maximal span per doc; tiling is self-duplication") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_subdup").toString
    val docs = Seq(
      // doc 0: run a..j + unique tail k l → grams at pos 0,1,2 duplicated
      (0L, "a b c d e f g h i j k l", "en", "t", 23L),
      // doc 1: unique head p q, the same run at offset 2, unique tail r s
      (1L, "p q a b c d e f g h i j r s", "en", "t", 27L),
      // doc 2: "m n o p" tiled 4× — every 8-gram duplicated 4 positions on
      (2L, "m n o p m n o p m n o p m n o p", "en", "t", 31L),
      // doc 3: all unique, shorter than 8 tokens — contributes nothing
      (3L, "u v w x y z", "en", "t", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("substring_dup_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (0L, 0L, 9L, 10L),   // a..j at positions 0..9
      (1L, 2L, 11L, 10L),  // a..j at positions 2..11
      (2L, 0L, 15L, 16L)), // the whole tiling is one duplicated span
      s"got $got")
  }
}
