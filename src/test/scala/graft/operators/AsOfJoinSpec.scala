package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val right = Seq(
    (1, ts("2025-01-01 00:00:00"), 100L, "v1"),
    (1, ts("2025-01-03 00:00:00"), 200L, "v2"),
    (1, ts("2025-01-03 00:00:00"), 300L, "v2b"), // tie on ts → larger seq wins
    (2, ts("2025-02-01 00:00:00"), 400L, "w1"))
    .toDF("key", "t", "seq", "val")

  private val left = Seq(
    (10L, 1, ts("2025-01-02 00:00:00")), // between v1 and v2 → v1
    (11L, 1, ts("2025-01-03 00:00:00")), // equal ts → inclusive, tie → v2b
    (12L, 1, ts("2025-01-04 00:00:00")), // after all → v2b
    (13L, 2, ts("2025-01-15 00:00:00")), // before first right row → null
    (14L, 3, ts("2025-01-01 00:00:00"))) // key with no right rows → null
    .toDF("order_id", "key", "t")

  test("as-of semantics: latest right row at-or-before, per key, seq tiebreak") {
    val out = AsOfJoin.asOf(left, right, "key", "key", "t", "t", "seq", Seq("seq", "val"))
      .orderBy("order_id")
      .select("order_id", "asof_seq", "asof_val")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(out.toSeq == Seq(
      (10L, Some(100L), Some("v1")),
      (11L, Some(300L), Some("v2b")),
      (12L, Some(300L), Some("v2b")),
      (13L, None, None),
      (14L, None, None)))
  }

  test("plan has no join node and exactly one shuffle") {
    val plan = AsOfJoin.asOf(left, right, "key", "key", "t", "t", "seq", Seq("val"))
      .queryExecution.executedPlan
    val norm = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val joins = norm.collect {
      case j: SortMergeJoinExec => j
      case j: BroadcastNestedLoopJoinExec => j
    }
    assert(joins.isEmpty, "as-of must be a window over a union, not a join")
    val shuffles = norm.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size <= 2, s"expected ≤2 shuffles (two-source union), got ${shuffles.size}")
  }

  test("left rows are never dropped or duplicated") {
    val out = AsOfJoin.asOf(left, right, "key", "key", "t", "t", "seq", Seq("val"))
    assert(out.count() == left.count())
    assert(out.select("order_id").distinct().count() == left.count())
  }
}
