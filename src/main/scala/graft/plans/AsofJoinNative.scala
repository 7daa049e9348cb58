package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the SURVEY.md §4 custom-work shortlist #1 and the
  * full (c)-tier custom-operator demonstration: a custom LogicalPlan
  * node, a SparkStrategy planning it, and a physical BinaryExecNode.
  *
  * Semantics (same as [[graft.ts.TimeSeries.asofJoin]]): for each left
  * row, attach the payload of the most recent right row with the same
  * key and rightTs <= leftTs; NULL payload when none exists. On
  * duplicate right (key, ts) the last row in sort order wins — callers
  * wanting full determinism pre-aggregate the right side per (key, ts),
  * exactly as the window formulation requires.
  *
  * Why a custom operator: the window trick unions BOTH sides into one
  * stream and sorts the combined relation, shuffling the left side's
  * full payload through the window. This exec instead co-partitions the
  * two sides on the key (one shuffle each, EnsureRequirements inserts
  * them), co-sorts by (key, ts), and streams a single forward merge per
  * partition with O(1) state — at 100 TB that is strictly less data
  * movement, and the merge never materializes a window buffer.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute],
    tolUs: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] → [[AsofJoinExec]]; injected per-session via
  * `spark.experimental.extraStrategies` (see [[AsofJoinNative.register]])
  * or `SparkSessionExtensions.injectPlannerStrategy`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lts, rts, payload, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, payload, tol) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned co-sorted streaming merge. Each task holds exactly one
  * candidate right row and the last match's (key, ts, payload) — state is
  * O(1) regardless of partition size, and spill behavior is inherited
  * from the child sorts.
  *
  * `tolUs`: optional max lookback in the ts column's native long unit
  * (µs for TimestampType): a candidate match only joins a left row when
  * leftTs − rightTs <= tolUs. Checked at EMIT time, per left row — the
  * same held match can be within tolerance for an early left row and
  * stale for a later one. */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute],
    tolUs: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    tolUs.foreach { _ =>
      val longBacked = tsType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType |
             org.apache.spark.sql.types.LongType => true
        case _ => false
      }
      require(longBacked,
        s"as-of tolerance requires a long-backed ts type, got ${tsType.simpleString}")
    }
    val tol = tolUs
    val payloadAttrs = payload
    val (lk, lt, rk, rt, pl) = (leftKey, leftTs, rightKey, rightTs, payloadAttrs)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val lTsProj = UnsafeProjection.create(Seq(lt), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val rTsProj = UnsafeProjection.create(Seq(rt), rOut)
      val payloadProj = UnsafeProjection.create(pl, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullPayload = new GenericInternalRow(pl.size)
      val joined = new JoinedRow
      // downstream operators (shuffles especially) require UnsafeRow;
      // payload attrs must be re-marked nullable here or the projection
      // writes 0-defaults instead of NULLs for no-match rows
      val outAttrs = lOut ++ pl.map(_.withNullability(true))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        // one held (copied) right row not yet consumed, or null
        private var held: InternalRow = _
        // last right row that matched some key, as (key, ts, payload) copies
        private var matchKey: InternalRow = _
        private var matchTs: Long = _
        private var matchPayload: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          // SQL join semantics: a NULL key matches nothing (the natural
          // ordering would treat NULL == NULL as equal)
          if (lKey.isNullAt(0)) return resultProj(joined(l, nullPayload))
          val lTs = lTsProj(l)
          var done = false
          while (!done && (held != null || rIter.hasNext)) {
            val r = if (held != null) held else rIter.next()
            val rKey = rKeyProj(r)
            if (rKey.isNullAt(0)) {
              held = null // NULL right keys match nothing — discard
            } else {
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp > 0 || (cmp == 0 && tsOrd.compare(rTsProj(r), lTs) > 0)) {
                // beyond this left row: hold (copy — child iterators reuse rows)
                if (held == null) held = r.copy()
                done = true
              } else {
                // match candidate: key equal, ts <= lTs. A NULL right ts
                // is never <= anything (SQL comparison semantics), so it
                // is discarded, not treated as -infinity.
                val rTs = rTsProj(r)
                if (cmp == 0 && !rTs.isNullAt(0)) {
                  matchKey = rKey.copy()
                  matchTs = rTs.getLong(0)
                  matchPayload = payloadProj(r).copy()
                } // cmp < 0: right row's key is behind every future left row too
                held = null
              }
            }
          }
          if (matchKey != null && keyOrd.compare(matchKey, lKey) == 0 &&
              tol.forall(t => lTs.getLong(0) - matchTs <= t)) {
            resultProj(joined(l, matchPayload))
          } else {
            resultProj(joined(l, nullPayload))
          }
        }
      }
    }
  }
}

/** Public entry for the native as-of join. */
object AsofJoinNative {

  /** Idempotently add the planner strategy to the session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** left ⟕asof right on `key`, most recent right row with
    * rightTs <= leftTs; output = left.* ++ payloadCols (NULL when no
    * match). Column names must be unambiguous within each side.
    * `tolUs`: optional max lookback — a match additionally requires
    * leftTs − rightTs <= tolUs (µs for timestamp columns), the practical
    * "stale quotes don't join" contract of ASOF joins. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payloadCols: Seq[String],
               tolUs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    // Route both plans through a throwaway crossJoin so the analyzer's
    // DeduplicateRelations re-IDs self-join conflicts (both sides often
    // scan the same base table), then lift out the deduplicated children.
    val j = left.crossJoin(right).queryExecution.analyzed.asInstanceOf[Join]
    val (lPlan, rPlan) = (j.left, j.right)
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in [${out.map(_.name).mkString(", ")}]"))
    val plan = AsofJoinPlan(lPlan, rPlan,
      attr(lPlan.output, key), attr(rPlan.output, key),
      attr(lPlan.output, leftTs), attr(rPlan.output, rightTs),
      payloadCols.map(attr(rPlan.output, _)), tolUs)
    org.apache.spark.sql.classic.GraftShim.ofRows(spark, plan)
  }
}
