package graft

import org.apache.spark.sql.execution.SparkPlan

/** Audit a FINAL adaptive plan for scale cliffs the sf0.001 CI sweeps
  * cannot see — AQE converts joins at runtime from observed sizes, so a
  * corpus-sized broadcast may exist ONLY at scale. Flags:
  *   - a BroadcastHashJoin whose build side reaches a checkpointed RDD
  *     scan without an intervening aggregate/rank-limit (the r12 cliff);
  *   - a broadcast build side that reaches a raw scan of a FACT-CLASS
  *     table (lineitem / documents / events / orders) the same way;
  *   - any CartesianProductExec.
  *
  * As of r13 [[audit]] runs inside every Bench smoke loop (VERDICT r12
  * task #5: the cliff class only exists at 10×, so CI can't see it) and
  * its hits land in the bench JSON under `"scale_audit"`. The standalone
  * main remains for one-off dev sweeps:
  *   runMain graft.ScaleAudit <sfDir>
  */
object ScaleAudit {

  private val fact = Seq("lineitem", "documents", "events", "orders")

  private def reachesRaw(n: SparkPlan): Option[String] = n match {
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => None
    case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => None
    case _: org.apache.spark.sql.execution.LocalLimitExec => None
    case _: org.apache.spark.sql.execution.GlobalLimitExec => None
    case _: org.apache.spark.sql.execution.RDDScanExec => Some("checkpointed-rdd")
    case f: org.apache.spark.sql.execution.FileSourceScanExec
      if f.relation.location.rootPaths.exists(p => fact.exists(p.toString.contains)) =>
      Some(f.relation.location.rootPaths.head.getName)
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec
      if j.joinType.toString == "LeftSemi" || j.joinType.toString == "LeftAnti" =>
      reachesRaw(j.left)
    case other => other.children.flatMap(reachesRaw(_)).headOption
  }

  /** All cliff hits in an executed plan (empty = clean). Walks through
    * adaptive wrappers and query stages to the runtime-final operators.
    */
  def audit(plan: SparkPlan): Seq[String] = {
    val hits = scala.collection.mutable.ArrayBuffer[String]()
    def walk(p: SparkPlan): Unit = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        val build = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case _ => j.right
        }
        reachesRaw(build).foreach(src =>
          hits += s"BHJ build<-$src keys=${j.leftKeys.mkString(",").take(40)}")
        j.children.foreach(walk)
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        hits += "CartesianProduct"; c.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(plan)
    hits.distinct.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val scaled = ScaleSmoke.ensureScaled(spark, sfDir)
    ScaleSmoke.smokeQueries.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, scaled)
        df.collect()
        val hits = audit(df.queryExecution.executedPlan)
        if (hits.nonEmpty) println(s"[scale-audit] $name: ${hits.mkString(" | ")}")
        else println(s"[scale-audit] $name: clean")
      } catch { case e: Throwable =>
        println(s"[scale-audit] $name: ERROR ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
