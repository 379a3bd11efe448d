package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CI leg of [[PlanAudit]] (r8 verdict task #4): the unpartitioned-window
  * guard must (a) fire on a deliberately unbounded plan and (b) stay
  * silent across the ENTIRE catalog — so any future query that funnels a
  * data-proportional stream through a single-task window fails CI here
  * instead of surfacing as a 20× driver-smoke ratio a round later.
  */
class WindowAuditSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("guard fires on a deliberately unpartitioned window over raw rows") {
    val ev = QueryDef.t(spark, sf, "events")
    val bad = ev.withColumn("rn",
      row_number().over(Window.orderBy("ts", "event_id")))
    val flags = PlanAudit.unboundedGlobalWindows(bad.queryExecution.executedPlan)
    assert(flags.nonEmpty,
      "a global row_number over the raw event stream must be flagged")
  }

  test("guard fires on the old-rfm shape: a global ntile over a " +
      "per-entity aggregate (r9 soundness hole, must-fire)") {
    // The r8 offender: groupBy(custkey) produces data-proportional rows
    // (one per customer), then an unpartitioned ntile funnels them all
    // through one task. The r9 audit accepted ANY aggregate in the
    // subtree and would have re-admitted this; the tightened check keys
    // on the id-like grouping column.
    val orders = QueryDef.t(spark, sf, "orders")
    val rfm = orders.groupBy("o_custkey")
      .agg(sum("o_totalprice").as("monetary"))
      .withColumn("tile", ntile(5).over(Window.orderBy("monetary")))
    val flags = PlanAudit.unboundedGlobalWindows(rfm.queryExecution.executedPlan)
    assert(flags.nonEmpty,
      "a global ntile over a per-customer aggregate must be flagged")
  }

  test("guard fires on raw rows joined to a broadcast aggregate " +
      "(the r9 hasBoundedInput false-negative)") {
    // The other hole ADVICE r9 called out: an aggregate ANYWHERE in the
    // subtree used to count as bounded, so raw data-proportional rows
    // that merely join a tiny aggregate slipped past. Boundedness must
    // follow the cardinality-dominant path: a join is bounded only if
    // every branch is.
    val ev = QueryDef.t(spark, sf, "events")
    val total = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val joined = ev.join(broadcast(total), Seq("event_type"))
      .withColumn("rn", row_number().over(Window.orderBy("ts", "event_id")))
    val flags = PlanAudit.unboundedGlobalWindows(joined.queryExecution.executedPlan)
    assert(flags.nonEmpty,
      "a global window over raw rows + broadcast aggregate must be flagged")
  }

  test("guard fires on a per-NODE aggregate with a non-id-like name " +
      "(r10 blacklist hole, must-fire)") {
    // The r10 heuristic blacklisted id-LIKE names (_id, .key, _hash…), so
    // a data-proportional grouping key named `node` / `src` / `nbr` — the
    // graph operators' vocabulary — passed silently. The whitelist
    // inversion makes unknown names unbounded by default.
    val li = QueryDef.t(spark, sf, "lineitem")
    val perNode = li.select(col("l_partkey").as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .withColumn("rank", row_number().over(Window.orderBy(col("deg").desc, col("node"))))
    val flags = PlanAudit.unboundedGlobalWindows(perNode.queryExecution.executedPlan)
    assert(flags.nonEmpty,
      "a global window over a per-node aggregate must be flagged even " +
        "though 'node' matches no id-like pattern")
  }

  test("guard stays silent on the collapse-to-histogram shape") {
    val ev = QueryDef.t(spark, sf, "events")
    val hist = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .withColumn("cum", sum("n").over(Window.orderBy("event_type")))
    assert(PlanAudit.unboundedGlobalWindows(hist.queryExecution.executedPlan).isEmpty,
      "an ordered window over a bounded aggregate is the sanctioned shape")
  }

  test("no BENCHED catalog query plans a CartesianProductExec — " +
      "unbroadcast cross products are the one join shape with no 100 TB story") {
    // Broadcast crossJoins (1-row totals, bounded dimension grids) plan
    // as BroadcastNestedLoopJoin and are fine; a CartesianProductExec
    // means BOTH sides were too big to broadcast and Spark fell back to
    // the full n*m shuffle — on the bench path that is always a bug
    // (brute-force oracle baselines are bench=false and exempt).
    val offenders = SparkEntry.all
      .filter(q => q.bench && !q.sideEffecting)
      .flatMap { q =>
        val cart =
          try {
            val p = q.spark(spark, sf).queryExecution.executedPlan match {
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                a.executedPlan // AQE root is a leaf; descend into the real plan
              case other => other
            }
            p.collectWithSubqueries {
              case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
            }
          } catch { case _: Throwable => Nil }
        if (cart.isEmpty) Nil else Seq(q.name)
      }
    assert(offenders.isEmpty,
      s"benched queries with cartesian products: ${offenders.mkString(", ")}")
  }

  test("no BENCHED catalog query broadcast-builds a checkpointed table — " +
      "a pinned leaf forfeits its stats, so the planner undersells it") {
    // round-12 cliff class (PLANS.md): localCheckpoint replaces a subtree
    // with an RDDScanExec whose size statistic undersells the data, and
    // the planner then broadcast-builds what may be a corpus-sized table
    // (set-similarity verifies measured this at the 10x lake). A
    // broadcast build side may reach a checkpointed scan only THROUGH an
    // aggregate (which bounds the build to its group domain) or through
    // another join's already-bounded output. Sweep every benched final
    // plan; a hit means the query needs a shuffle_hash/merge hint.
    def reachesRawRdd(n: org.apache.spark.sql.execution.SparkPlan): Boolean =
      n match {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
        // a rank-limit bounds the subtree to k rows per group — the
        // naive_bayes top-10-per-lang broadcast is the sanctioned case
        case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => false
        case _: org.apache.spark.sql.execution.RDDScanExec => true
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.toString == "LeftSemi" || j.joinType.toString == "LeftAnti" =>
          // a semi/anti join bounds its output to the probe side's
          // matching rows — treat like the probe subtree
          reachesRawRdd(j.left)
        case other => other.children.exists(reachesRawRdd)
      }
    val offenders = SparkEntry.all
      .filter(q => q.bench && !q.sideEffecting)
      .flatMap { q =>
        // a query that fails to PLAN is an offender, not a clean pass —
        // swallowing the Throwable here would let the exact audit this
        // test exists for silently skip a broken query (ADVICE r12)
        val hits =
          try {
            val p = q.spark(spark, sf).queryExecution.executedPlan match {
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                a.executedPlan
              case other => other
            }
            p.collectWithSubqueries {
              case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
                if {
                  val build = j.buildSide match {
                    case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
                    case _ => j.right
                  }
                  reachesRawRdd(build)
                } => j
            }.map(_ => "broadcast build reaches a checkpointed scan")
          } catch { case e: Throwable =>
            Seq(s"plan build failed: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
          }
        if (hits.isEmpty) Nil else Seq(s"${q.name}: ${hits.head}")
      }
    assert(offenders.isEmpty,
      s"benched queries broadcast-building a checkpointed table: ${offenders.mkString(", ")}")
  }

  test("no catalog query runs an unpartitioned window over an unbounded " +
      "input (whitelist excepted)") {
    val offenders = SparkEntry.all.filter(!_.sideEffecting)
      .filterNot(q => PlanAudit.boundedWindowWhitelist.contains(q.name))
      .flatMap { q =>
        val flags =
          try PlanAudit.unboundedGlobalWindows(
            q.spark(spark, sf).queryExecution.executedPlan)
          catch { case e: Throwable => Seq(s"plan build failed: ${e.getMessage}") }
        if (flags.isEmpty) Nil else Seq(s"${q.name}: ${flags.mkString("; ")}")
      }
    assert(offenders.isEmpty,
      s"unbounded single-task windows (fix with the decomposed-rank " +
        s"pattern or whitelist with a rationale):\n${offenders.mkString("\n")}")
  }
}
