package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native backward AS-OF join — the §7.3(c) whole-operator exemplar:
  * a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, injected via
  * `GraftExtensions` (`spark.sql.extensions`-loadable on a cluster).
  *
  * Semantics (matching DuckDB's `ASOF LEFT JOIN` and pandas
  * `merge_asof(direction="backward")`): every left row is joined to the
  * single right row with the same key and the LARGEST right time that is
  * `<=` the left time; left rows with no such right row keep right-side
  * NULLs. Ties among right rows at the same (key, time) resolve to the
  * last row in sort order — pre-dedupe the right side to one row per
  * (key, time) when a deterministic result is required (q37/q37b do).
  *
  * Why a custom operator (SURVEY §2.B joins / §7.4 risk 3): Spark has no
  * executable as-of join — the Catalyst `AsOfJoin` node that backs the
  * pandas-on-Spark API is rewritten by the analyzer (`RewriteAsOfJoin`)
  * into a win-over-aggregation shape and never reaches the planner, and
  * the relational encodings (range join → O(n·m) explosion, or q37's
  * union + ordered window) either don't scale or make two passes over
  * the union. The textbook algorithm is a SORTED MERGE with a one-row
  * lookahead — O(n+m) per partition after one shuffle per side, state =
  * exactly one remembered right row. This operator declares
  *   requiredChildDistribution = ClusteredDistribution(key) per child
  *   requiredChildOrdering     = (key ASC, time ASC) per child
  * and lets `EnsureRequirements` plant the exchanges and sorts — the
  * same contract SortMergeJoinExec uses, so AQE, co-partitioning reuse
  * and bucketed inputs (a right side bucketed by key joins with ZERO
  * shuffle) all compose for free. At 100 TB this is one shuffle of each
  * input and constant per-row work — the plan you'd want.
  *
  * The merge is a single-pass iterator (`doExecute`), not codegen —
  * the same tier as Spark's own SMJ outer paths, and measured at parity
  * with the q37 composite locally (see BASELINE.md).
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  // Left-outer shape: right attributes go nullable, exprIds preserved
  // (same convention as logical.Join for LeftOuter).
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Injected with
  * `injectPlannerStrategy` — runs alongside Spark's JoinSelection, fires
  * only on the graft node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge backward as-of join. Children arrive hash-clustered on
  * the key and sorted by (key, time) — both sides are consumed exactly
  * once per partition with one remembered candidate row. */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  // One output row per left row, in left order, left partitioning.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    // Orderings are codegen'd (not serializable) — capture the TYPES and
    // generate per partition, same pattern as Spark's sort operators.
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTime
    val rt = rightTime

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
        val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
        val lKeyProj = UnsafeProjection.create(Seq(lk), leftOut)
        val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
        val rKeyProj = UnsafeProjection.create(Seq(rk), rightOut)
        val rTimeProj = UnsafeProjection.create(Seq(rt), rightOut)
        val outProj = UnsafeProjection.create(outAttrs, leftOut ++ rightOut)
        val rightNulls = new GenericInternalRow(rightOut.length)
        val joined = new JoinedRow

        // One-row lookahead over the right side. The head's key/time are
        // COPIED single-field rows (projection output is reused); the
        // full row is only copied when it becomes the candidate match.
        var headRow: InternalRow = null
        var headKey: InternalRow = null
        var headTime: InternalRow = null
        def advanceRight(): Unit = {
          headRow = null
          while (headRow == null && rIter.hasNext) {
            val r = rIter.next()
            // Null key/time can never satisfy "same key, time <= t": skip.
            val k = rKeyProj(r)
            val t = rTimeProj(r)
            if (!k.isNullAt(0) && !t.isNullAt(0)) {
              headRow = r
              headKey = k.copy()
              headTime = t.copy()
            }
          }
        }
        advanceRight()

        // The remembered match for the CURRENT left key (copied — right
        // rows are buffer-backed and reused by the child iterator).
        var candidate: InternalRow = null
        var candidateKey: InternalRow = null

        lIter.map { l =>
          val k = lKeyProj(l)
          if (k.isNullAt(0)) {
            // Null left key matches nothing.
            numOutputRows += 1
            outProj(joined(l, rightNulls))
          } else {
            if (candidateKey != null && keyOrd.compare(candidateKey, k) != 0) {
              candidate = null
              candidateKey = null
            }
            val t = lTimeProj(l)
            if (!t.isNullAt(0)) {
              // Consume right rows up to (k, t): skip keys before k,
              // remember the latest right row at key k with time <= t.
              var advancing = true
              while (advancing && headRow != null) {
                val kc = keyOrd.compare(headKey, k)
                if (kc < 0) advanceRight()
                else if (kc == 0 && timeOrd.compare(headTime, t) <= 0) {
                  candidate = headRow.copy()
                  candidateKey = headKey
                  advanceRight()
                } else advancing = false
              }
            }
            numOutputRows += 1
            // A null left time never matches ("most recent <= NULL").
            if (candidate != null && !t.isNullAt(0)) {
              numMatched += 1
              outProj(joined(l, candidate))
            } else {
              outProj(joined(l, rightNulls))
            }
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
