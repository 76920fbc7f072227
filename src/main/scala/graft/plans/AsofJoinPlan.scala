package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.{DataFrame, functions => F}

/** As-of join as a first-class Catalyst operator (SURVEY.md §3 tier (c)) —
  * the second native plan after [[EwmaNode]], covering THE canonical
  * time-series join.
  *
  * The composed formulation (TimeSeriesOps.asofCore, semantics-parity with
  * the reference's label alignment, turbofan.py:133-138) unions both sides
  * into one widened relation and runs `last(_, ignoreNulls)` over a
  * per-key window — correct, oracle-gated, but structurally wasteful at
  * scale: every left row is carried through the window sort widened by the
  * right-side payload columns, the union forces BOTH sides through ONE
  * exchange+sort sized |L|+|R|, and — decisive at 100 TB — the plan can
  * never reuse an existing partitioning of either input because the union
  * output is a new relation.
  *
  * This operator instead *declares* its requirements like a sort-merge
  * join: each child clustered on its key and sorted (key, ts[, ties]), so
  * EnsureRequirements inserts per-side exchanges only when an input isn't
  * already partitioned that way — an as-of join chained after any per-key
  * operator (EWMA, sessionize, another as-of) reuses the left partitioning
  * outright (AsofPlanSpec pins the exchange counts), and bucketed tables
  * join shuffle-free. Within each co-partition the match is a single
  * two-pointer merge: O(|L|+|R|) with O(1) state — no widened union row,
  * no window buffer.
  *
  * DESIGN NOTE — names, not Attributes: the node stores COLUMN NAMES and
  * resolves them against `children`'s current output on every access.
  * Attribute fields captured at construction go stale the moment the
  * analyzer rewrites a child underneath — concretely,
  * DeduplicateRelations renews the right child's exprIds whenever both
  * sides derive from the same scan (`right = left.filter(...)`, the
  * NORMAL way to build the purchase side), and a custom node is not in
  * that rule's list of binary operators whose expressions get remapped.
  * The first bench run of the Attribute-field version died exactly there
  * (ATTRIBUTE_NOT_FOUND binding user_id against the renewed purchase
  * scan). Name resolution is self-healing under any such rewrite; the
  * wrapper enforces name uniqueness per side so it is unambiguous.
  *
  * Matching contract (equal to asofCore on time-orderable rows,
  * spec-pinned by whole-corpus equality): each left row gets the LAST
  * (backward) / FIRST (forward) non-null right value whose timestamp is
  * <= (resp. >=) the left timestamp; right rows at an equal timestamp are
  * visible (standard allow_exact_matches); `rightTieCols` total-order
  * equal-timestamp right rows so the survivor is deterministic;
  * `toleranceUs` nulls out matches farther than the bound, measured
  * against the timestamp of the row that PROVIDED the value. Null-valued
  * right rows never contribute a value nor a tolerance timestamp.
  *
  * ONE deliberate divergence (spec-pinned): rows with a NULL timestamp.
  * The composed form happens to let a null-ts right row act as a
  * negative-infinity fallback for every backward match of its key — not
  * a designed behavior, just NULLS FIRST window ordering putting the row
  * at the front of every frame (and symmetrically a null-ts LEFT row
  * matches the whole partition forward). This operator takes the
  * position that a row without a time cannot participate in a time join:
  * null-ts right rows provide no match (filtered scan-side by the
  * wrapper so the filter pushes down, skipped defensively at ingest) and
  * null-ts left rows produce none.
  */
case class AsofJoinNode(key: String, tsCol: String, rightValCol: String,
                        rightTieCols: Seq[String],
                        forward: Boolean, toleranceUs: Option[Long],
                        left: LogicalPlan, right: LogicalPlan,
                        // constructor param so plan transforms (copy) keep
                        // the exprId stable across optimizer copies
                        asofAttr: AttributeReference =
                          AttributeReference("asof_val", DoubleType,
                            nullable = true)())
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofAttr
  // demand every left column (all re-emitted) but only the right columns
  // the match consumes — the rest may be pruned beneath the right child
  override def references: AttributeSet = AttributeSet(left.output ++
    (Seq(key, tsCol, rightValCol) ++ rightTieCols)
      .flatMap(n => right.output.filter(_.name == n)))
  override def producedAttributes: AttributeSet = AttributeSet(asofAttr :: Nil)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(key: String, tsCol: String, rightValCol: String,
                        rightTieCols: Seq[String],
                        forward: Boolean, toleranceUs: Option[Long],
                        asofAttr: AttributeReference,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {
  // resolved against the CURRENT children on every access — AQE swaps
  // children for query stages and re-plans between stages; names survive
  // every such rewrite, captured Attributes would not (see the node's
  // design note)
  private def la(n: String): Attribute = left.output.find(_.name == n)
    .getOrElse(throw new IllegalStateException(
      s"as-of column $n not in left output ${left.output}"))
  private def ra(n: String): Attribute = right.output.find(_.name == n)
    .getOrElse(throw new IllegalStateException(
      s"as-of column $n not in right output ${right.output}"))

  override def output: Seq[Attribute] = left.output :+ asofAttr
  override def references: AttributeSet = AttributeSet(left.output ++
    (Seq(key, tsCol, rightValCol) ++ rightTieCols).map(ra))
  override def producedAttributes: AttributeSet = AttributeSet(asofAttr :: Nil)

  // each side clustered on its key — EnsureRequirements co-partitions the
  // two children (same hash family, same partition count) exactly as it
  // does for a sort-merge join, inserting an exchange only where needed
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(la(key))) :: ClusteredDistribution(Seq(ra(key))) :: Nil

  // right-side ties participate in the sort so the equal-timestamp
  // survivor is the same row the composed window formulation picks
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(la(key), la(tsCol)).map(a => SortOrder(a, Ascending)),
    (Seq(ra(key), ra(tsCol)) ++ rightTieCols.map(ra))
      .map(a => SortOrder(a, Ascending)))

  // all left rows pass through unchanged: left's partitioning (and order)
  // survive, which is what lets chained per-key operators skip exchanges
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lTsIdx = lOut.indexWhere(_.name == tsCol)
    val rTsIdx = rOut.indexWhere(_.name == tsCol)
    val rValIdx = rOut.indexWhere(_.name == rightValCol)
    require(lTsIdx >= 0 && rTsIdx >= 0 && rValIdx >= 0,
      s"as-of columns not found in child output: $lOut / $rOut")
    require(lOut(lTsIdx).dataType == LongType &&
      rOut(rTsIdx).dataType == LongType,
      s"as-of timestamps must be LongType µs")
    require(rOut(rValIdx).dataType == DoubleType,
      s"as-of right value must be DoubleType, got ${rOut(rValIdx).dataType}")
    val fwd = forward
    val tol = toleranceUs
    val keyType = la(key).dataType
    require(keyType == ra(key).dataType,
      s"as-of key types differ: $keyType vs ${ra(key).dataType}")
    val lKeyAttr = la(key)
    val rKeyAttr = ra(key)
    val outSchema = output
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(Seq(lKeyAttr), lOut)
        val rKeyProj = UnsafeProjection.create(Seq(rKeyAttr), rOut)
        val resultProj = UnsafeProjection.create(outSchema, lOut :+ outSchema.last)
        val ord = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
        // right rows reduced eagerly to (copied key, ts, value): upstream
        // unsafe rows are buffer-reused, so a BufferedIterator head over
        // the raw rows would be invalidated by its own advance. Null
        // values/timestamps contribute nothing — skip at ingest.
        val rReduced = rIter.flatMap { row =>
          if (row.isNullAt(rValIdx) || row.isNullAt(rTsIdx)) None
          else Some((rKeyProj(row).copy(), row.getLong(rTsIdx),
            row.getDouble(rValIdx)))
        }.buffered
        // backward: last consumed (value, ts) of the current run — O(1)
        var memKey: UnsafeRow = null
        var memTs = 0L
        var memVal = 0.0
        val joined = new JoinedRow
        val asofRow = new GenericInternalRow(1)
        lIter.map { lrow =>
          var value: Any = null
          if (!lrow.isNullAt(lTsIdx)) {
            val lk = lKeyProj(lrow) // reused buffer — compared before next row
            val lts = lrow.getLong(lTsIdx)
            if (fwd) {
              // drop right rows strictly before this left timestamp (or of
              // earlier keys); the head is then the first eligible match
              while (rReduced.hasNext && {
                val h = rReduced.head
                val c = ord.compare(h._1, lk)
                c < 0 || (c == 0 && h._2 < lts)
              }) rReduced.next()
              if (rReduced.hasNext) {
                val h = rReduced.head
                if (ord.compare(h._1, lk) == 0 &&
                    tol.forall(t => h._2 - lts <= t)) value = h._3
              }
            } else {
              // consume right rows at-or-before this left timestamp; the
              // last consumed of this key is the match (ties resolved by
              // the declared right ordering — last survivor wins)
              while (rReduced.hasNext && {
                val h = rReduced.head
                val c = ord.compare(h._1, lk)
                c < 0 || (c == 0 && h._2 <= lts)
              }) {
                val h = rReduced.next()
                memKey = h._1; memTs = h._2; memVal = h._3
              }
              if (memKey != null && ord.compare(memKey, lk) == 0 &&
                  tol.forall(t => lts - memTs <= t)) value = memVal
            }
          }
          asofRow.update(0, value)
          resultProj(joined(lrow, asofRow)): InternalRow
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(n.key, n.tsCol, n.rightValCol, n.rightTieCols,
        n.forward, n.toleranceUs, n.asofAttr,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

object AsofJoin {
  /** Append `asof_val` via the native operator. Same contract as
    * `TimeSeriesOps.asofJoin` / `asofJoinForward` (whole-corpus equality
    * is spec-pinned); installs the planner strategy on first use
    * (idempotent). `tsUsCol` must be a µs long on both sides (exact
    * column names, unique on the left); `rightValCol` is cast to double
    * scan-side. */
  def apply(left: DataFrame, right: DataFrame, key: String, tsUsCol: String,
            rightValCol: String, rightTieCols: Seq[String] = Nil,
            toleranceUs: Option[Long] = None,
            forward: Boolean = false): DataFrame = {
    require(!left.columns.contains("asof_val"),
      "asofJoinNative appends asof_val; rename the existing input column")
    Seq(key, tsUsCol).foreach { n =>
      require(left.columns.count(_ == n) == 1,
        s"as-of column $n must appear exactly once on the left, " +
          s"found ${left.columns.count(_ == n)}")
    }
    val rNames = Seq(key, tsUsCol, rightValCol) ++ rightTieCols
    require(rNames.distinct.size == rNames.size,
      s"as-of right-side columns must be distinct names, got $rNames")
    // fail at definition, not at execution: the exec re-checks (it must,
    // as the authoritative resolver), but a bad call should not need a
    // Spark job to be diagnosed
    require(left.schema(tsUsCol).dataType == LongType &&
      right.schema(tsUsCol).dataType == LongType,
      s"as-of timestamps must be LongType µs, got " +
        s"${left.schema(tsUsCol).dataType}/${right.schema(tsUsCol).dataType}")
    require(left.schema(key).dataType == right.schema(key).dataType,
      s"as-of key types differ: ${left.schema(key).dataType} vs " +
        s"${right.schema(key).dataType}")
    val spark = left.sparkSession
    Ewma.installStrategy(spark, AsofJoinStrategy)
    // shape the right side scan-side: only the consumed columns (which
    // also guarantees unique right names), value cast to double, null
    // value/ts rows dropped HERE so the filter is a plain Filter the
    // optimizer can push into the scan (the exec's ingest skip is a
    // defensive second line, not the workhorse)
    val rShaped = right
      .select((Seq(key, tsUsCol) ++ rightTieCols).map(F.col) :+
        F.col(rightValCol).cast("double").as(rightValCol): _*)
      .filter(F.col(rightValCol).isNotNull && F.col(tsUsCol).isNotNull)
    val lp = org.apache.spark.sql.graftbridge.PlanBridge.logicalPlan(left)
    val rp = org.apache.spark.sql.graftbridge.PlanBridge.logicalPlan(rShaped)
    val node = AsofJoinNode(key, tsUsCol, rightValCol, rightTieCols,
      forward, toleranceUs, lp, rp)
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, node)
  }
}
