package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B for the round-16 native bounded-heap aggregate
  * (VERDICT r15 #2): times the three hier searches with the heap engine
  * selected by `SPARK_GRAFT_HEAP` (`native` = the
  * [[graft.functions.TopKHeapAgg]] TypedImperativeAggregate everywhere,
  * `udaf` = the round-15 ScalaAggregator form everywhere, `mixed` /
  * unset = the per-site default — udaf on routing heaps, native on
  * cut/prescore heaps; see [[graft.vec.VecOps.heapCol]]). Protocol
  * identical to
  * [[AbFallback]]: one fresh 64 GiB JVM per arm
  * (`SPARK_DRIVER_MEM=64g SPARK_GRAFT_HEAP=<arm> sbt "runMain
  * graft.AbHeap <fixtureDir> <reps>"`), third-decade
  * ObjectHashAggregate threshold pinned for BOTH arms (the knob under
  * test here is the heap engine, not the fallback), routing memo
  * cleared per rep so every rep pays the full search. */
object AbHeap {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/dev/shm/graft-scale1000x"
    val reps = if (args.length > 1) args(1).toInt else 3
    // optional 3rd arg: run ONLY the named query — the round-16 matrix
    // showed the three-searches-one-JVM protocol confounds later rows
    // with earlier rows' storage state (ivfpq read 211 s after a fast
    // refine vs 155 s after a slow one); isolated fresh-JVM rows are the
    // decision-grade readings (BASELINE.md round-16).
    val only = if (args.length > 2) Some(args(2)) else None
    def wants(q: String) = only.forall(_ == q)
    val arm = sys.env.getOrElse("SPARK_GRAFT_HEAP", "mixed")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "8388608")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeN(tag: String)(f: => Long): Unit = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val mid = runs.map(_._1).sorted.apply(runs.size / 2)
      println(f"[ab] heap=$arm%-7s $tag%-36s ${mid}%8.2f s   rows=${runs.head._2}  all=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    val emb = Tables(spark, dir).embeddings
    if (wants("ivf_hier_topk")) timeN("ivf_hier_topk")({
      graft.vec.VecOps.clearRoutingCache()
      graft.vec.VecOps.ivfHierTopK(emb,
        graft.vec.VecOps.lloyd2CentroidsShared(emb, dir),
        fprobes = 2, k = 3).count()
    })
    if (wants("ivf_hier_refine_topk")) timeN("ivf_hier_refine_topk")({
      graft.vec.VecOps.clearRoutingCache()
      graft.vec.VecOps.ivfHierRefineTopK(emb,
        graft.vec.VecOps.lloyd2CentroidsShared(emb, dir),
        fprobes = 2, shortlist = 16, k = 3).count()
    })
    if (wants("ann_ivfpq_hier_topk")) timeN("ann_ivfpq_hier_topk")({
      graft.vec.VecOps.clearRoutingCache()
      graft.vec.VecOps.ivfPqHierTopK(emb,
        graft.vec.VecOps.lloyd2CentroidsShared(emb, dir),
        fprobes = 2, k = 3).count()
    })
    spark.stop()
  }
}
