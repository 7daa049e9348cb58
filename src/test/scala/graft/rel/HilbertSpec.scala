package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two defining properties of the hilbert_layout mapping on the
  * FULL 256×256 grid (65 536 cells):
  *  - bijectivity: every cell maps to a distinct index in [0, 65536);
  *  - unit-step locality: consecutive indices are GRID NEIGHBORS
  *    (Manhattan distance exactly 1) — the property Morton/zorder lacks
  *    (its worst adjacent-index jump spans half the domain) and the
  *    reason Hilbert buckets bound both dimensions tighter.
  * Any edit to the generated level expressions that silently breaks the
  * curve (a wrong reflection, a swapped rotation branch) fails here even
  * while the layout query itself still hash-matches its own oracle. */
class HilbertSpec extends SparkSpec {

  private def fullGrid = {
    var df = spark.range(65536L).toDF("i")
      .selectExpr("CAST(i div 256 AS BIGINT) AS x0", "CAST(i % 256 AS BIGINT) AS y0")
      .selectExpr("x0", "y0", "x0 AS x", "y0 AS y", "CAST(0 AS BIGINT) AS d")
    RelQueries.hilbertLevels.foreach { case (bitExprs, stepExprs) =>
      df = df.selectExpr(bitExprs: _*).selectExpr(stepExprs: _*)
    }
    df.select(col("x0"), col("y0"), col("d"))
  }

  test("hilbert index is a bijection onto [0, 65536)") {
    val agg = fullGrid.agg(
      countDistinct(col("d")).as("nd"),
      min(col("d")).as("mn"), max(col("d")).as("mx")).head()
    assert(agg.getLong(0) == 65536L)
    assert(agg.getLong(1) == 0L)
    assert(agg.getLong(2) == 65535L)
  }

  test("consecutive hilbert indices are grid neighbors (unit steps only)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("d"))
    val steps = fullGrid
      .select(col("x0"), col("y0"), col("d"),
        lag(col("x0"), 1).over(w).as("px"), lag(col("y0"), 1).over(w).as("py"))
      .filter(col("px").isNotNull)
      .select((abs(col("x0") - col("px")) + abs(col("y0") - col("py"))).as("step"))
      .groupBy(col("step")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(steps == Map(1L -> 65535L), s"non-unit steps present: $steps")
  }
}
