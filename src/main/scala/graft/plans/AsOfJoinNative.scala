package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator Catalyst extension (SURVEY §7.4 tier (c)): a native
  * backward as-of join — custom `LogicalPlan` + `SparkStrategy` +
  * custom `SparkPlan` — as the physical alternative to the
  * union+window rewrite in `graft.operators.AsOfJoin`.
  *
  * Semantics (identical to the composed operator and to DuckDB's
  * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`, which the
  * declared query is oracle-checked against):
  *   - every left row is emitted once;
  *   - it carries the payload of the right row with the greatest
  *     `ts <= left.ts` within the same key (ties inclusive), else
  *     nulls;
  *   - null keys group together (GROUP BY-style, matching the window
  *     rewrite; SQL equality semantics would drop them);
  *   - among right rows with identical (key, ts) the last in sort
  *     order wins — callers should keep (key, ts) unique on the right
  *     for determinism, as any as-of formulation requires.
  *
  * Physical shape vs the union+window rewrite:
  *   - rewrite: pad both sides to the union schema, ONE exchange+sort
  *     over |L|+|R| rows of the WIDE padded schema, a running
  *     `last(_, ignoreNulls)` window per payload column, then a filter
  *     dropping the |R| build rows;
  *   - native: each side shuffles and sorts in its OWN schema (no
  *     null-padding — at 100 TB that is roughly half the shuffled
  *     bytes when schemas are wide), then a streaming two-pointer
  *     partition merge with O(1) state (one buffered build row), no
  *     window machinery, no post-filter, and the output keeps a
  *     declared ordering/partitioning downstream operators can reuse.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute) extends BinaryNode {

  /** Carried columns: everything on the right except its key/ts. */
  lazy val payload: Seq[Attribute] =
    right.output.filterNot(a => a.exprId == rightKey.exprId || a.exprId == rightTs.exprId)
      .map(_.withNullability(true))

  override def output: Seq[Attribute] = left.output ++ payload

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule owned by the custom operator: push filter conjuncts
  * that reference only the PROBE side below [[AsOfJoinPlan]]. Sound
  * because every left row passes through exactly once (left-outer
  * semantics, no multiplication, no left-column rewriting) — and
  * necessary because Catalyst's PushDownPredicate cannot see through
  * an unknown node, so without this a probe-side date filter would
  * run after the join instead of reaching the parquet scan. Payload-
  * side conjuncts stay above (they reference generated nulls). */
object AsOfJoinFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(_.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(org.apache.spark.sql.catalyst.expressions.And), aj.left))
        keep.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; injected via
  * `GraftExtensions` (spark.sql.extensions) or idempotently through
  * `session.experimental.extraStrategies` by [[AsOfJoinNative.asof]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p @ AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(lk, rk, lts, rts, p.output, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted partition-wise merge as-of join. Requires both children
  * hash-clustered on the key and sorted by (key, ts) — Spark's
  * EnsureRequirements inserts the exchanges/sorts, and AQE remains
  * free to re-plan them. The merge itself is a streaming two-pointer
  * pass per partition: O(|L|+|R|) time, O(1) memory (one buffered
  * build row), no spill surface. */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    override val output: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // left rows pass through in order, so both properties are preserved —
  // a downstream groupBy/window on (key) or (key, ts) re-uses them
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKeyExpr.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsExpr.dataType))
      // bind payload against nullable-widened right attrs: unmatched left
      // rows read from the all-null row, which a non-nullable
      // BoundReference would silently read as 0/false
      val resultProj =
        UnsafeProjection.create(outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)

      new Iterator[InternalRow] {
        // head of the unconsumed right stream (key/ts copied: the
        // projections reuse their buffers)
        private var rCur: InternalRow = _
        private var rCurKey: InternalRow = _
        private var rCurTs: InternalRow = _
        // latest right row already consumed for the current key
        private var matchRow: InternalRow = _
        private var matchKey: InternalRow = _
        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rCur = rIter.next()
            rCurKey = rKeyProj(rCur).copy()
            rCurTs = rTsProj(rCur).copy()
          } else rCur = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTs = lTsProj(l)
          var cmp = if (rCur == null) 1 else keyOrd.compare(rCurKey, lKey)
          while (rCur != null &&
              (cmp < 0 || (cmp == 0 && tsOrd.compare(rCurTs, lTs) <= 0))) {
            if (cmp == 0) { matchRow = rCur.copy(); matchKey = rCurKey }
            advanceRight()
            cmp = if (rCur == null) 1 else keyOrd.compare(rCurKey, lKey)
          }
          val rhs =
            if (matchRow != null && keyOrd.compare(matchKey, lKey) == 0) matchRow
            else nullRight
          numOutputRows += 1
          resultProj(joined(l, rhs))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point for the native operator. */
object AsOfJoinNative {
  import org.apache.spark.sql.GraftBridge

  /** Idempotently add the planner strategy + the operator's own
    * optimizer rule to an existing session (the cluster path is
    * `--conf spark.sql.extensions=graft.functions.GraftExtensions`,
    * which injects both at session build). */
  def ensureRegistered(spark: SparkSession): Unit = {
    GraftBridge.addStrategy(spark, AsOfJoinStrategy)
    GraftBridge.addOptimization(spark, AsOfJoinFilterPushdown)
  }

  /** Left backward as-of join via the native operator. Same contract
    * as `AsOfJoin.asofBackward`: both sides expose `key` and `tsCol`,
    * the right side's remaining columns are the carried payload and
    * must not collide with left column names. */
  def asof(left: DataFrame, right: DataFrame, key: String, tsCol: String): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    var rPlan = right.queryExecution.analyzed
    // self-join dedup: Catalyst's DeduplicateRelations only rewrites its
    // own node types, so a custom node re-aliases the right side itself
    // whenever the two subtrees share attribute ids
    if (lPlan.outputSet.intersect(rPlan.outputSet).nonEmpty) {
      rPlan = Project(rPlan.output.map(a => Alias(a, a.name)()), rPlan)
    }
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof: column '$name' not found in [${plan.output.map(_.name).mkString(", ")}]"))
    val overlap = rPlan.output.map(_.name).filterNot(n => n == key || n == tsCol)
      .toSet.intersect(lPlan.output.map(_.name).toSet)
    require(overlap.isEmpty,
      s"asof requires disjoint non-key columns; shared: ${overlap.mkString(", ")}")
    GraftBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, tsCol), attr(rPlan, tsCol)))
  }
}
