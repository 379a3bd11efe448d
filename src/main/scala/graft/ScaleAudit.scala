package graft

/** Dev-only: execute every smoke query on the 10×-scaled lake and audit
  * the FINAL adaptive plans for scale cliffs the sf0.001 CI sweeps
  * cannot see — AQE converts joins at runtime from observed sizes, so a
  * corpus-sized broadcast may exist ONLY at scale. Flags:
  *   - a BroadcastHashJoin whose build side reaches a checkpointed RDD
  *     scan without an intervening aggregate/rank-limit (the r12 cliff);
  *   - a broadcast build side that reaches a raw scan of a FACT-CLASS
  *     table (lineitem / documents / events / orders) the same way.
  *   runMain graft.ScaleAudit <sfDir>
  */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val scaled = ScaleSmoke.ensureScaled(spark, sfDir)
    val fact = Seq("lineitem", "documents", "events", "orders")
    def reachesRaw(n: SparkPlan): Option[String] = n match {
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
    def walk(p: SparkPlan, hit: String => Unit): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan, hit)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan, hit)
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          val build = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }
          reachesRaw(build).foreach(src => hit(s"BHJ build<-$src keys=${j.leftKeys.mkString(",").take(40)}"))
          j.children.foreach(walk(_, hit))
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec =>
          hit("CartesianProduct"); c.children.foreach(walk(_, hit))
        case other => other.children.foreach(walk(_, hit))
      }
    }
    ScaleSmoke.smokeQueries.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, scaled)
        df.collect()
        val hits = scala.collection.mutable.ArrayBuffer[String]()
        walk(df.queryExecution.executedPlan, hits += _)
        if (hits.nonEmpty) println(s"[scale-audit] $name: ${hits.distinct.mkString(" | ")}")
        else println(s"[scale-audit] $name: clean")
      } catch { case e: Throwable =>
        println(s"[scale-audit] $name: ERROR ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
