package graft.mm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiModalSpec extends SparkSpec {
  import spark.implicits._

  private def payloads = {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val empty = Seq((-1L, Array.empty[Byte])).toDF("doc_id", "payload")
    docs.unionByName(empty)
  }

  test("phash oracle ASCII contract holds on the fixture (bytes ≡ chars)") {
    // The phash32/phash64 DuckDB oracles recompute block energies from
    // CHARACTERS (length/ascii) while the Spark side hashes UTF-8 BYTES;
    // the two agree iff the corpus is pure ASCII (ADVICE r14). This
    // assertion makes the assumption loud: a regenerated fixture with
    // multi-byte text fails HERE, not as a silent oracle divergence in
    // the length>=64 gate or the block boundaries.
    // every fixture generation available to the suite — the graded sf0.1
    // dir included (ADVICE r15: a non-ASCII regeneration at the scales
    // this spec didn't cover would surface only as an opaque Verify hash
    // mismatch; ScaleDemo's replicated decade fixtures inherit ASCII-ness
    // from these parents, so covering the parents covers them)
    val scales = new java.io.File("/root/testdata").listFiles.toSeq
      .filter(d => new java.io.File(d, "documents.parquet").exists)
      .map(_.getName).sorted
    assert(scales.nonEmpty, "no fixture dirs with documents.parquet found")
    for (scale <- scales) {
      val nonAscii = graft.Tables(spark, sf(scale)).documents
        .filter(octet_length(encode(col("text"), "UTF-8")) =!= length(col("text")))
        .count()
      assert(nonAscii == 0L,
        s"$scale: $nonAscii docs have multi-byte text — the char-based " +
          "phash oracles no longer match the byte-based Spark payload")
    }
  }

  test("hammingPairsMulti: banding-invariant and equal to brute two-word hd") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val fps = MultiModal.phash128(docs).localCheckpoint()
    def run(bits: Int) = MultiModal
      .hammingPairsMulti(fps, words = 2, chunks = 4, bitsPerChunk = bits,
        maxHd = 3)
      .select("doc_a", "doc_b", "hd").orderBy("doc_a", "doc_b").collect()
    val brute = fps.as("a").crossJoin(fps.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("aggregate(zip_with(a.ph, b.ph, (x, y) -> bit_count(x ^ y)), " +
          "0, (acc, e) -> acc + e)").as("hd"))
      .filter(col("hd") <= 3)
      .orderBy("doc_a", "doc_b").collect()
    // pigeonhole recall is exact for ANY valid banding, so every width
    // must reproduce the brute ground truth bit-for-bit
    val (a, b) = (run(8), run(16))
    assert(a.toSeq == brute.toSeq && b.toSeq == brute.toSeq,
      s"banding changed the output: ${a.length}/${b.length} vs brute ${brute.length}")
    // invalid layouts must refuse loudly, not band wrong
    intercept[IllegalArgumentException] {
      MultiModal.hammingPairsMulti(fps, words = 2, chunks = 5,
        bitsPerChunk = 8, maxHd = 3)
    }
  }

  test("columnar extractFeatures equals the codec-seam implementation") {
    val a = MultiModal.extractFeatures(payloads).orderBy("doc_id").collect()
    val b = MultiModal.extractFeaturesViaCodec(payloads).orderBy("doc_id").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("columnar extractFeatures stays in whole-stage codegen, no RDD hop") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val plan = MultiModal.extractFeatures(docs).queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1)"), plan.take(300))
    assert(!plan.contains("ExistingRDD"), "columnar path must not round-trip through an RDD")
  }

  test("Arrow batch seam equals the columnar path, incl. empty payloads and small batches") {
    val a = MultiModal.extractFeatures(payloads).orderBy("doc_id").collect()
    // batchSize=3 forces multiple batches (vector recycling) on the tiny fixture
    val b = MultiModal.extractFeaturesViaArrow(payloads, batchSize = 3)
      .orderBy("doc_id").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("Arrow batch seam survives early downstream termination (limit)") {
    // the task-completion listener must close the allocator when the
    // iterator is abandoned mid-batch — a leak throws on allocator close
    val few = MultiModal.extractFeaturesViaArrow(payloads, batchSize = 3)
      .limit(2).collect()
    assert(few.length == 2)
  }

  test("sampleFrames yields no frames for empty payloads instead of crashing") {
    val frames = MultiModal.sampleFrames(payloads, stride = 16, maxFrames = 3)
    assert(frames.filter(col("doc_id") === -1L).count() == 0)
    assert(frames.count() > 0)
  }

  test("autoChunkBits resolves the fixture bandings and refuses the measured-OOM regime") {
    // fixture-scale corpora resolve the pinned reference bandings
    assert(MultiModal.autoChunkBits(32, 3, 500L) == (4, 8))
    assert(MultiModal.autoChunkBits(32, 3, 5000L) == (4, 8))
    assert(MultiModal.autoChunkBits(32, 1, 500000L) == (2, 16))
    // the 10× decade (occ ≈ 195) measured fine — must stay allowed
    assert(MultiModal.autoChunkBits(32, 3, 50000L) == (4, 8))
    // the r11 OOM config (500 k docs, maxHd=3 → capped 4×8, occ ≈ 1953)
    // must now fail loudly instead of silently resolving (ADVICE r12)
    val e = intercept[IllegalArgumentException] {
      MultiModal.autoChunkBits(32, 3, 500000L)
    }
    assert(e.getMessage.contains("outgrown"))
  }
}
