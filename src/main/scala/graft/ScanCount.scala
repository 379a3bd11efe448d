package graft

/** Dev-only (r17): for every batch catalog query, count FileSourceScan
  * instances per input path in the EXECUTED plan and print queries that
  * scan any single source 3+ times — the multi-consumer re-plan signature
  * (PLANS.md round-11 rule). Subqueries included.
  *
  *   sbt 'runMain graft.ScanCount [sfDir] [minDup]'
  */
object ScanCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val minDup = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.all.filter(!_.sideEffecting).foreach { q =>
      try {
        val p = q.spark(spark, sfDir).queryExecution.executedPlan
        val norm = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case other => other
        }
        val scans = norm.collectWithSubqueries {
          case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
            sc.relation.location.rootPaths.headOption.map(_.getName)
              .getOrElse("?")
        }
        val dup = scans.groupBy(identity).view.mapValues(_.size)
          .filter(_._2 >= minDup).toMap
        if (dup.nonEmpty)
          println(s"[scancount] ${q.name}: " +
            dup.map { case (t, n) => s"$t x$n" }.mkString(", "))
      } catch { case e: Throwable =>
        println(s"[scancount] ${q.name}: ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
