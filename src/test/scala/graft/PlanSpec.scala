package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Physical-plan assertions (the 100 TB checklist): dimension joins
  * broadcast, filters pushed to the parquet scan, and the SCD2 job has
  * exactly one shuffle. Asserting on plans keeps scale regressions from
  * sneaking in as "still passes correctness".
  */
class PlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val norm = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    norm.collectWithSubqueries(pf)
  }

  test("q3/q5 dimension sides are broadcast, not shuffled") {
    for (q <- Seq("q3_shipping_priority", "q5_local_supplier_volume")) {
      val bhj = collectAll(plan(q)) { case j: BroadcastHashJoinExec => j }
      assert(bhj.nonEmpty, s"$q: expected broadcast hash join(s) for dimension tables")
    }
  }

  test("q1 scan prunes columns and pushes the shipdate filter") {
    val scans = collectAll(plan("q1_pricing_summary")) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    val readCols = scan.schema.fieldNames.toSet
    assert(!readCols.contains("l_orderkey") && !readCols.contains("l_partkey"),
      s"column pruning failed: scan reads $readCols")
    assert(scan.metadata.get("PushedFilters").exists(_.contains("l_shipdate")),
      s"shipdate filter not pushed: ${scan.metadata.get("PushedFilters")}")
  }

  test("scd2_history has exactly one shuffle (the window exchange)") {
    val shuffles = collectAll(plan("scd2_history")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1,
      s"SCD2 must shuffle once on the key; found ${shuffles.size}")
  }

  test("every query plans without error at sf0.001 and returns rows") {
    for (q <- SparkEntry.all) {
      val df = q.spark(spark, sf)
      assert(df.count() >= 0, s"${q.name} failed to execute")
    }
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
