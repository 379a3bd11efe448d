package graft

import java.nio.file.{Files, Paths}

/** Plan-audit main: dumps every catalog query's formatted physical plan to
  * one file and flags scale red-flags (cartesian products without an
  * explicit crossJoin rationale, full-schema scans).
  *
  *   sbt 'runMain graft.ExplainAll [sfDir] [outFile]'
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/tmp/graft_plans.md")
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.all.filter(!_.sideEffecting).foreach { q =>
      val qe = try Some(q.spark(spark, sfDir).queryExecution)
               catch { case _: Throwable => None }
      val plan = qe.map(_.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        .getOrElse("ERROR building plan")
      sb.append(s"\n## ${q.name}\n\n```\n$plan```\n")
      val windowFlags =
        if (PlanAudit.boundedWindowWhitelist.contains(q.name)) Nil
        else qe.toSeq.flatMap(e => PlanAudit.unboundedGlobalWindows(e.executedPlan))
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"))
        .collect { case (f, true) => f } ++ windowFlags
      if (flags.nonEmpty) println(s"[flag] ${q.name}: ${flags.mkString(", ")}")
    }
    val skipped = SparkEntry.all.filter(_.sideEffecting).map(_.name)
    if (skipped.nonEmpty)
      sb.append(s"\n## skipped (sideEffecting — streaming runs, no batch plan to audit)\n\n" +
        skipped.mkString("- ", "\n- ", "\n"))
    Files.writeString(Paths.get(out), sb.toString)
    println(s"plans -> $out")
    spark.stop()
  }
}
