package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** Whole-operator custom plan: broadcast as-of join.
  *
  * [[graft.operators.AsOf.join]] composes the as-of join from a union and
  * one window pass — one shuffle of |L|+|R| rows, the right default at
  * scale. But when the right (reference) side is small — a quote table, a
  * config-change log, a purchase stream per user — even that one shuffle
  * of the *left* side is wasted work: the right side fits on every
  * executor, and each left row can resolve its match with a local binary
  * search, the way a broadcast hash join replaces a shuffle join.
  *
  * Spark has no as-of join primitive and no way to express "greatest
  * right ts ≤ left ts" as an equi-join Catalyst could broadcast — a naive
  * `join(cond = key === key && rts <= lts)` plans as a
  * BroadcastNestedLoopJoin (O(|L|·|R|)) followed by a max-per-group
  * re-aggregation. So this is the genuine custom-LogicalPlan case of the
  * preference order: a logical node ([[AsOfJoin]]), a planner strategy
  * ([[GraftStrategies]]), and a physical operator
  * ([[BroadcastAsOfJoinExec]]) that broadcasts a key → ts-sorted-rows
  * index of the right side and binary-searches per left row:
  * zero shuffles, zero sorts of the left side, O(|L| log |R|) work.
  *
  * Semantics (identical to AsOf.join, asserted by AsOfSpec): inclusive
  * match (rightTs ≤ leftTs), right side unique per (key, ts), no prior
  * right row → nulls; null keys group like `Window.partitionBy` does.
  *
  * Reference parity: sif has no joins at all (SURVEY §2.5); this is part
  * of the parity-plus relational surface, expressed at the layer Spark
  * intends for whole-operator extensions (SparkSessionExtensions /
  * experimental strategies).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    carry: Seq[Attribute],
    outAttrs: Seq[AttributeReference]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outAttrs
  // outAttrs are *produced* here, not consumed from a child.
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping [[AsOfJoin]] to [[BroadcastAsOfJoinExec]].
  * Register per-session (`spark.experimental.extraStrategies`) or fleet-
  * wide via [[graft.GraftExtensions]].
  */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      BroadcastAsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.rightKey, j.leftTs, j.rightTs, j.carry, j.outAttrs) :: Nil
    case _ => Nil
  }
}

case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    carry: Seq[Attribute],
    outAttrs: Seq[AttributeReference]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)
  // No shuffle is introduced and left rows pass through in place.
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "probe rows with an as-of match"),
    "numIndexKeys" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "broadcast index keys"))

  /** Long-comparable getter for an ordering column: integral, timestamp
    * and date types compare losslessly as long (the double-cast trap —
    * epoch nanos beyond 2^53 — cannot arise).
    */
  private def tsGetter(e: Expression, input: Seq[Attribute]): InternalRow => Any = {
    val bound = BindReferences.bindReference(e, input)
    bound.dataType match {
      case LongType | TimestampType | TimestampNTZType =>
        row => bound.eval(row)
      case IntegerType | DateType =>
        row => { val v = bound.eval(row); if (v == null) null else v.asInstanceOf[Int].toLong }
      case other => throw new IllegalArgumentException(
        s"broadcast as-of ordering column must be integral/timestamp/date, got ${other.catalogString}")
    }
  }

  protected override def doExecute(): RDD[InternalRow] = {
    // --- build the broadcast index: key -> (sorted ts array, carried rows)
    val rightRows = right.executeCollect()
    val rKeyProj = UnsafeProjection.create(Seq(rightKey), right.output)
    val rTs = tsGetter(rightTs, right.output)
    val rCarryProj = UnsafeProjection.create(carry, right.output)
    val grouped = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(Long, UnsafeRow)]]()
    rightRows.foreach { row =>
      val ts = rTs(row)
      if (ts != null) { // null right ts can never satisfy rts <= lts deterministically — skip
        val k = rKeyProj(row).copy()
        var buf = grouped.get(k)
        if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty; grouped.put(k, buf) }
        buf += ((ts.asInstanceOf[Long], rCarryProj(row).copy()))
      }
    }
    val index = new java.util.HashMap[UnsafeRow, (Array[Long], Array[UnsafeRow])](grouped.size())
    grouped.forEach { (k, buf) =>
      val sorted = buf.sortBy(_._1)
      // The contract requires the right side unique per (key, ts) — a
      // violation would make the joined row an arbitrary pick (collect
      // order), so fail loudly instead (pre-aggregate the right side).
      var i = 1
      while (i < sorted.length) {
        if (sorted(i)._1 == sorted(i - 1)._1) throw new IllegalArgumentException(
          s"broadcast as-of join: right side has duplicate rows at ts=${sorted(i)._1} " +
            "for one key — it must be unique per (key, ts); pre-aggregate first")
        i += 1
      }
      index.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    }
    val bcast: Broadcast[java.util.HashMap[UnsafeRow, (Array[Long], Array[UnsafeRow])]] =
      sparkContext.broadcast(index)
    metrics("numIndexKeys").add(index.size())

    val carryTypes = carry.map(_.dataType)
    val outRows = metrics("numOutputRows")
    val matchedRows = metrics("numMatched")
    left.execute().mapPartitions({ iter =>
      val idx = bcast.value
      val lKeyProj = UnsafeProjection.create(Seq(leftKey), left.output)
      val lTs = tsGetter(leftTs, left.output)
      val outProj = UnsafeProjection.create(output, left.output ++ outAttrs)
      val joined = new JoinedRow
      val nullRow: InternalRow = {
        val r = new GenericInternalRow(carryTypes.length)
        r // GenericInternalRow initializes to nulls
      }
      iter.map { lrow =>
        val entry = idx.get(lKeyProj(lrow))
        val ts = lTs(lrow)
        val matched: InternalRow =
          if (entry == null || ts == null) nullRow
          else {
            // binary search: greatest i with tsArr(i) <= ts (inclusive as-of)
            val (tsArr, rows) = entry
            var lo = 0; var hi = tsArr.length - 1; var res = -1
            val t = ts.asInstanceOf[Long]
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tsArr(mid) <= t) { res = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (res < 0) nullRow else { matchedRows.add(1); rows(res) }
          }
        outRows.add(1)
        outProj(joined(lrow, matched))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
