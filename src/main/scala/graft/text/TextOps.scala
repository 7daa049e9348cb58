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

  /** Word n-gram shingles (distinct). Docs with fewer than n tokens yield
    * an empty set — without the guard, sequence(0, negative) produces a
    * descending index array and slice() throws on index 0. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      array_distinct(
        transform(sequence(lit(0), size(t) - n), i =>
          concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** docs(doc_id, text) → (doc_id, shingle) exploded, distinct per doc. */
  def explodedShingles(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), explode(shingles(col("text"), n)).as("shingle"))

  /** Word n-gram shingles WITH multiplicity (no dedup) — repetition
    * statistics need every occurrence, not the set. Same short-doc guard
    * as [[shingles]]. */
  def shinglesAll(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** MinHash hash family: ONE md5 per shingle (the expensive, portable
    * part), then k cheap affine rehashes h_i = (h·A_i + B_i) mod P over
    * the 31-bit prime field — the standard universal-hashing family, fully
    * deterministic and expressible in DuckDB SQL as well. */
  val MinhashP: Long = 2147483647L
  def minhashA(i: Int): Long = (1103515245L * (i + 1) + 12345L) % MinhashP
  def minhashB(i: Int): Long = (987654321L * (i + 1) + 555555L) % MinhashP

  /** MinHash signature: k affine rehashes of one base hash, min-aggregated
    * in a single hash-aggregate pass. */
  def minhashSignature(sh: DataFrame, k: Int): DataFrame = {
    val base = sh.withColumn("hm", hash60(col("shingle")) % MinhashP)
    val mins = (0 until k).map(i =>
      min((col("hm") * minhashA(i) + minhashB(i)) % MinhashP).as(s"h$i"))
    base.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH bands of `rows` signature values each: (doc_id, band, k1..kr) —
    * the band key is the raw value tuple, no re-hashing needed. */
  def lshBands(sig: DataFrame, bands: Int, rows: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band") +: (0 until rows).map(r =>
        col(s"h${b * rows + r}").as(s"k$r")): _*)
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id") +: (Seq("band") ++ (0 until rows).map(r => s"k$r")).map(f => col(s"bk.$f")): _*)
  }

  /** Candidate pairs (a < b) sharing at least one LSH band. Single-pass
    * formulation: instead of a band-key SELF-join (which reads the
    * signature relation twice and forced a `.cache()` that leaked across
    * invocations), bucket members are collected per band key — sorted, so
    * pair order is deterministic — and pairs are expanded with an array
    * comprehension. One signature computation, one shuffle, nothing
    * cached; the per-bucket fan-out is the same Σ bucket² the self-join
    * paid, and collect_list is bounded by bucket size (the LSH collision
    * contract), not corpus size. */
  def lshCandidates(bandsDf: DataFrame, rows: Int): DataFrame = {
    val keys = (Seq("band") ++ (0 until rows).map(r => s"k$r")).map(col)
    bandsDf.groupBy(keys: _*)
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), b -> struct(a AS doc_a, b AS doc_b))))")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b")).distinct()
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
      // two sub-n-token docs both have empty shingle sets → union 0;
      // define their Jaccard as 0 rather than divide by zero (ANSI throws)
      .withColumn("_union", size(col("set_a")) + size(col("set_b")) - col("inter"))
      .withColumn("jaccard",
        when(col("_union") > 0, col("inter").cast("double") / col("_union"))
          .otherwise(lit(0.0)))
      .drop("_union")
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Near-duplicate pairs: MinHash → LSH banding → exact Jaccard filter.
    * k = bands·rowsPerBand hashes. At 100 TB the band-bucket shuffle is
    * the only one that touches all docs, and its fan-out is bounded by
    * bucket collision rates, not the quadratic pair count. The signature
    * pipeline runs exactly once (single-pass [[lshCandidates]]), so
    * nothing needs caching — and nothing leaks into the block manager
    * across invocations (asserted in CacheLifecycleSpec). */
  def nearDupPairs(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
                   minJaccard: Double): DataFrame = {
    val sig = minhashSignature(explodedShingles(docs, n), bands * rowsPerBand)
    val cand = lshCandidates(lshBands(sig, bands, rowsPerBand), rowsPerBand)
    exactJaccard(cand, docs, n).filter(col("jaccard") >= minJaccard)
  }

  /** SimHash near-duplicate pairs at Hamming distance <= maxHd, banded by
    * `chunks` equal bit-chunks of the fingerprint (the classic simhash
    * dedup index): by pigeonhole, hd <= chunks−1 implies at least one
    * identical chunk, so for maxHd < chunks the chunk join has EXACT
    * recall — no probabilistic miss. The only all-docs shuffle is the
    * (chunk_idx, chunk_value) grouping (same single-pass pair expansion
    * as [[lshCandidates]]); the final bit_count(xor) filter touches only
    * candidates. At 100 TB this is Σ bucket², never n². */
  def simhashNearDupPairs(docs: DataFrame, chunks: Int, bitsPerChunk: Int,
                          maxHd: Int): DataFrame = {
    require(maxHd < chunks, "pigeonhole recall needs maxHd < chunks")
    val mask = (1L << bitsPerChunk) - 1
    val chunked = simhash(docs).select(col("doc_id"), col("simhash"),
      posexplode(expr(
        s"transform(sequence(0, ${chunks - 1}), c -> shiftright(simhash, c * $bitsPerChunk) & $mask)"))
        .as(Seq("c", "ck")))
    chunked.groupBy(col("c"), col("ck"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), " +
          "b -> struct(a.doc_id AS doc_a, a.simhash AS sh_a, b.doc_id AS doc_b, b.simhash AS sh_b))))")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"),
        expr("bit_count(p.sh_a ^ p.sh_b)").as("hd"))
      .distinct()
      .filter(col("hd") <= maxHd)
  }

  /** Connected components over an undirected pair relation (the corpus-
    * dedup step AFTER near-dup pairs: pairs → clusters → one survivor per
    * cluster). Iterative min-label propagation: every round each node
    * adopts the smallest label in its closed neighborhood; converges in
    * O(component diameter) rounds — near-dup clusters are short-diameter
    * by construction (they're Jaccard balls), so rounds stay single-digit.
    *
    * Scale notes (100 TB): each round is one equi-join + one hash-agg on
    * the node key — no driver-side data beyond the per-round changed
    * COUNT; labels are checkpointed per round so the plan doesn't
    * grow with iteration count (the classic iterative-DataFrame trap).
    *
    * Checkpoint mode: `reliable = false` (default) uses localCheckpoint —
    * executor-local blocks, zero extra I/O, right for single-node and for
    * clusters with stable executors. At 100 TB on preemptible executors a
    * lost executor severs the truncated lineage mid-iteration and kills
    * the job, so `reliable = true` snapshots each round's labels to
    * parquet under `graft.cc.checkpointDir` (session conf; point it at
    * durable storage — HDFS/object store — on a real cluster: the
    * /dev/shm default is for single-JVM runs only and does NOT survive
    * executor loss). Round N−1's snapshot is deleted as soon as round N
    * is written (round-7 ADVICE fix: checkpoints previously accumulated
    * one labels snapshot per round, unbounded across rounds and calls),
    * so at most two round snapshots plus the edge relation exist at any
    * instant. The FINAL snapshot backs the returned DataFrame and is
    * reclaimed at the next reliable call in this JVM — persist the
    * result downstream if it must outlive that. Same labels either way —
    * ConnectedComponentsSpec runs both modes against the union-find
    * reference. Returns (node, label), label = min doc_id of component. */
  /** `jump = true` adds POINTER JUMPING (shortcutting) to each round:
    * after the neighbor-min step, every node also adopts the label OF
    * its label (one equi-join against the previous round's map — label
    * values are always same-component node ids, so the jump is safe).
    * Reach roughly doubles per round → O(log diameter) convergence,
    * which is what CHAINED near-dup graphs need: a Hamming-distance
    * relation links A–B–C into paths whose diameter grows with the
    * corpus (observed: the 10× phash graph exceeded 30 plain rounds),
    * unlike the short-diameter Jaccard balls the default serves. */
  def connectedComponents(pairs: DataFrame, a: String = "doc_a",
                          b: String = "doc_b", maxRounds: Int = 30,
                          reliable: Boolean = false,
                          jump: Boolean = false): DataFrame = {
    val spark = pairs.sparkSession
    val runDir: Option[String] = if (reliable) {
      val base = spark.conf.getOption("graft.cc.checkpointDir")
        .getOrElse("/dev/shm/graft-ckpt/cc")
      // reclaim the previous reliable run's final snapshot
      Option(lastReliableRun.getAndSet(null)).foreach(p =>
        graft.sources.Fixtures.delete(java.nio.file.Paths.get(p)))
      Some(s"$base/run-${java.util.UUID.randomUUID().toString.take(8)}")
    } else None
    def ckpt(df: DataFrame, tag: String): DataFrame = runDir match {
      case Some(d) =>
        val p = s"$d/$tag"
        df.write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      case None => df.localCheckpoint()
    }
    def drop(tag: String): Unit = runDir.foreach(d =>
      graft.sources.Fixtures.delete(java.nio.file.Paths.get(s"$d/$tag")))
    // materialize the edge relation ONCE: it is referenced twice per
    // round, and without the checkpoint every round would re-run the
    // whole upstream pipeline that produced the pairs (e.g. the full
    // MinHash→LSH→Jaccard chain) — measured 4× the query cost at sf0.1
    val edges = ckpt(pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst"))), "edges")
    var labels = ckpt(edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")), "labels-0")
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label").as("nlabel")), "dst")
        .groupBy(col("src").as("node")).agg(min(col("nlabel")).as("nl"))
      val base = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("next"))
      // shortcut through the PREVIOUS round's map (stale jumping — no
      // second materialization of this round's labels needed; labels
      // only shrink, so a stale jump target is still same-component)
      val stepped = if (!jump) base
        else base
          .join(labels.select(col("node").as("next"), col("label").as("jl")),
            Seq("next"), "left")
          .select(col("node"), col("label"),
            least(col("next"), coalesce(col("jl"), col("next"))).as("next"))
      val updated = ckpt(stepped, s"labels-${round + 1}")
      drop(s"labels-$round") // round N written+read from its own files now
      changed = updated.filter(col("next") < col("label")).count()
      labels = updated.select(col("node"), col("next").as("label"))
      round += 1
    }
    require(changed == 0, s"label propagation did not converge in $maxRounds rounds")
    drop("edges")
    runDir.foreach(lastReliableRun.set)
    labels
  }

  // last reliable connectedComponents run dir, reclaimed on the next call
  private val lastReliableRun =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** 60-bit SimHash over distinct tokens: bit i of the fingerprint is set
    * iff the sum of ±1 contributions (per-token hash bit i) is positive.
    *
    * Single-pass formulation: the ±1 sum over tokens equals
    * 2·(count of tokens with bit i set) − n_tokens, so the whole
    * fingerprint is ONE hash-aggregate of 60 per-bit sums + a count —
    * partial aggregation compacts each map partition to one 61-column row
    * per doc before the shuffle. The previous formulation exploded every
    * token into 60 bit-rows (a 60× shuffle fan-out of the text hot path);
    * TextOpsSpec pins the plan to a single Generate (the token explode)
    * and a single aggregation level. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(tokens(col("text")))).as("w"))
      .withColumn("hv", hash60(col("w")))
    val bitSums = (0 until 60).map(i => sum(expr(s"(hv >> $i) & 1")).as(s"c$i")) :+
      count(lit(1)).as("n")
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(i =>
          when(col(s"c$i") * 2 > col("n"), lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }
}
