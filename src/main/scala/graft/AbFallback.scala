package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B for the ObjectHashAggregate sort-based fallback threshold
  * (round 15, VERDICT r14 #2): every bounded-heap cut in the vec family
  * runs through ObjectHashAggregateExec, which falls back to SORT-BASED
  * aggregation once the per-partition hash map exceeds
  * spark.sql.objectHashAggregate.sortBased.fallbackThreshold keys —
  * default 128. At any real decade the per-partition group count is in
  * the tens of thousands, so the partial agg that the heap design
  * promised ("candidate volume never hits a sort") silently degrades to
  * an external sort of the candidate rows. This main times the graded
  * hier rows at one decade with the default vs a raised threshold —
  * the BASELINE.md round-15 attribution matrix's harness (one fresh
  * 64 GiB JVM per arm: `SPARK_DRIVER_MEM=64g sbt "runMain
  * graft.AbFallback <fixtureDir> <threshold> <reps>"`).
  */
object AbFallback {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/dev/shm/graft-scale100x"
    val thr = if (args.length > 1) args(1) else "128"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeN(tag: String)(f: => Long): Unit = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val mid = runs.map(_._1).sorted.apply(runs.size / 2)
      println(f"[ab] thr=$thr%-8s $tag%-36s ${mid}%8.2f s   rows=${runs.head._2}  all=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    val emb = Tables(spark, dir).embeddings
    // routing memo cleared per rep (round 16): the threshold under test
    // affects the routing heap aggs too, and a memo hit would make reps
    // 2+ time only the post-routing stages
    timeN("ivf_hier_topk")({
      graft.vec.VecOps.clearRoutingCache()
      graft.vec.VecOps.ivfHierTopK(emb,
        graft.vec.VecOps.lloyd2CentroidsShared(emb, dir),
        fprobes = 2, k = 3).count()
    })
    timeN("ivf_hier_refine_topk")({
      graft.vec.VecOps.clearRoutingCache()
      graft.vec.VecOps.ivfHierRefineTopK(emb,
        graft.vec.VecOps.lloyd2CentroidsShared(emb, dir),
        fprobes = 2, shortlist = 16, k = 3).count()
    })
    spark.stop()
  }
}
