package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the t-digest quantile sketch (`tdigest_clusters`): the
  * defining k₁-scale size bound, rank-accurate quantile queries against
  * the exact order statistics, and mergeability (re-clustering the
  * centroid multisets of two half-digests approximates the full digest)
  * — the property that lets a 1000-executor cluster tree-merge
  * per-partition digests. */
class TDigestSpec extends SparkSpec {
  private val delta = 32.0

  /** (value, clusterIdx) for a sorted column under the k₁ scale. */
  private def clustersOf(sorted: Vector[Long]): Vector[(Long, Long)] = {
    val n = sorted.length.toDouble
    sorted.zipWithIndex.map { case (v, i) =>
      val q = (i + 0.5) / n
      val k = math.floor(delta * (math.asin(2.0 * q - 1.0) / math.Pi + 0.5))
      (v, k.toLong)
    }
  }

  private def digest(sorted: Vector[Long]): Vector[(Long, Long, Long)] =
    clustersOf(sorted).groupBy(_._2).toVector.sortBy(_._1).map {
      case (k, vs) => (k, vs.length.toLong, vs.map(_._1).sum / vs.length)
    }

  /** Quantile estimate: centroid of the cluster holding rank ⌈q·n⌉. */
  private def estimate(dig: Vector[(Long, Long, Long)], q: Double): Long = {
    val n = dig.map(_._2).sum
    val target = math.max(1L, math.ceil(q * n).toLong)
    var acc = 0L
    dig.find { case (_, cnt, _) => acc += cnt; acc >= target }.get._3
  }

  private lazy val byType: Map[String, Vector[Long]] = {
    val rows = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
    rows.groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(1)).toVector.sorted }
  }

  test("k1 scale bound: no cluster exceeds ceil(pi*n/(2*delta)) + 1 points") {
    byType.foreach { case (t, sorted) =>
      val maxPts = digest(sorted).map(_._2).max
      val bound = math.ceil(math.Pi * sorted.length / (2.0 * delta)).toLong + 1
      assert(maxPts <= bound, s"$t: cluster of $maxPts pts > bound $bound")
    }
  }

  test("tail clusters are near-singletons (extreme quantiles stay sharp)") {
    byType.foreach { case (_, sorted) =>
      val dig = digest(sorted)
      // k1's slope at the tails gives O(1) points to the first/last cluster
      assert(dig.head._2 <= 3 && dig.last._2 <= 3)
    }
  }

  test("digest quantile estimates are within one cluster-width of exact") {
    byType.foreach { case (t, sorted) =>
      val dig = digest(sorted)
      val n = sorted.length
      for (q <- Seq(0.5, 0.95, 0.99)) {
        val est = estimate(dig, q)
        val exact = sorted((math.ceil(q * n).toInt - 1).max(0))
        // est is a centroid of a cluster whose rank span covers the
        // target → its VALUE lies between that cluster's min and max;
        // assert the rank of est differs from the target by at most the
        // k1 size bound (rank error, the t-digest accuracy contract)
        val rankOfEst = sorted.count(_ <= est)
        val bound = math.ceil(math.Pi * n / (2.0 * delta)) + 1
        assert(math.abs(rankOfEst - math.ceil(q * n)) <= bound,
          s"$t q=$q est=$est exact=$exact rank err > $bound")
      }
    }
  }

  test("merge: re-clustering two half-digests' centroids tracks the full digest") {
    byType.foreach { case (_, sorted) =>
      val (h1, h2) = sorted.zipWithIndex.partition(_._2 % 2 == 0)
      // each half builds its own digest; merging = treating every centroid
      // as a point weighted by its count and re-clustering the union
      val merged = (digest(h1.map(_._1)) ++ digest(h2.map(_._1)))
        .flatMap { case (_, cnt, c) => Vector.fill(cnt.toInt)(c) }.sorted
      val dm = digest(merged)
      val df = digest(sorted)
      for (q <- Seq(0.5, 0.95)) {
        val em = estimate(dm, q)
        val ef = estimate(df, q)
        val n = sorted.length
        val bound = math.ceil(math.Pi * n / (2.0 * delta)) + 1
        // merged estimate's rank in the ORIGINAL data stays within twice
        // the single-digest rank bound (each merge level adds one width)
        val rankM = sorted.count(_ <= em)
        val rankF = sorted.count(_ <= ef)
        assert(math.abs(rankM - rankF) <= 2 * bound)
      }
    }
  }

  test("spark query clusters match the reference construction") {
    val got = graft.SparkEntry.queries("tdigest_clusters")(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toVector
    // reference: same (type, cluster, n_pts) triples derived locally.
    // NOTE the spark query ranks ties by (cents, event_id); cluster
    // membership for tied cents can differ from a plain value sort only
    // in which EQUAL value lands where — n_pts per cluster is invariant.
    val want = byType.toVector.flatMap { case (t, sorted) =>
      digest(sorted).map { case (k, cnt, _) => (t, k, cnt) }
    }.sortBy(x => (x._1, x._2))
    assert(got.map(x => (x._1, x._2, x._3)) == want)
  }
}
