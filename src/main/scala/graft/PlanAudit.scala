package graft

import org.apache.spark.sql.execution.SparkPlan

/** Structural scale audits over physical plans — the harness leg of the
  * r8 verdict's "unpartitioned window" finding, generalized so the class
  * can't recur (the HUGEINT-guard playbook applied to plans): any
  * `WindowExec` with an EMPTY partition spec funnels its whole input
  * through one task, which is fine over a domain-bounded aggregate
  * (calendar days, cent histograms, decile tables) and a 100 TB killer
  * over anything data-proportional.
  *
  * Used by [[ExplainAll]] (per-round plan dump) and pinned in CI by
  * `WindowAuditSpec`, which sweeps every catalog query and fails on any
  * new unbounded site that isn't explicitly whitelisted with a rationale.
  */
object PlanAudit {

  import org.apache.spark.sql.execution._

  /** Catalog queries whose unpartitioned ordered windows are bounded for
    * reasons the structural rule below can't see. Every entry must carry
    * the boundedness argument; adding a name here is a review decision,
    * not a green-CI shortcut.
    */
  val boundedWindowWhitelist: Map[String, String] = Map(
    // MMR re-rank: the pool tables are localCheckpoint-pinned LIMIT-k
    // outputs (the RDDScan hides the upstream GlobalLimit), so every
    // window input is ≤ poolK rows by construction.
    "sim_mmr_rerank" -> "windows read localCheckpoint-pinned LIMIT-k pools"
  )

  /** Flags `WindowExec` nodes with an empty partition spec and a
    * non-empty order spec whose subtree shows no evidence of a bounded
    * input: no aggregate (the collapse-to-histogram pattern), no
    * limit/top-k (bounded lists), no local relation. Returns one message
    * per offending node; empty = clean.
    */
  def unboundedGlobalWindows(plan: SparkPlan): Seq[String] = {
    val norm = plan match {
      case a: adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    norm.collectWithSubqueries {
      case w: window.WindowExec
          if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
            !hasBoundedInput(w) =>
        s"unpartitioned ordered window over a non-aggregated input " +
          s"(single task at scale): ${w.simpleString(120)}"
    }
  }

  private def hasBoundedInput(w: SparkPlan): Boolean =
    w.children.exists(_.collectFirst {
      case _: aggregate.HashAggregateExec => ()
      case _: aggregate.ObjectHashAggregateExec => ()
      case _: aggregate.SortAggregateExec => ()
      case _: GlobalLimitExec => ()
      case _: LocalLimitExec => ()
      case _: TakeOrderedAndProjectExec => ()
      case _: window.WindowGroupLimitExec => ()
      case _: LocalTableScanExec => ()
      case r: RDDScanExec if r.name == "OneRowRelation" => ()
    }.nonEmpty)
}
