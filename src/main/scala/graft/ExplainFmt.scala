package graft

import java.nio.file.{Files, Paths}

/** Dev-only (r17 optimization round): dump `.explain("formatted")` plus the
  * executed (AQE-final) plan for named catalog queries to
  * `<outDir>/<name>_<tag>.txt` — the before/after plan evidence files the
  * optimization judge reads (plans/r17/). Formatted mode carries the scan
  * details (PushedFilters / ReadSchema), the Exchange placement and the
  * join strategies; the executed plan appended below shows what AQE
  * actually ran (reused exchanges, runtime join downgrades, coalesced
  * reads).
  *
  *   sbt 'runMain graft.ExplainFmt <sfDir> <name1,name2,...> <outDir> <tag>'
  */
object ExplainFmt {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq.filter(_.nonEmpty).distinct
    val outDir = Paths.get(args(2))
    val tag = args.lift(3).getOrElse("before")
    Files.createDirectories(outDir)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // Execute to finalize every AdaptiveSparkPlan, then capture the plan
      // that actually ran (the formatted dump above is the pre-execution
      // view: isFinalPlan=false on AQE roots).
      Materialize.force(df)
      val fin = df.queryExecution.executedPlan.toString
      val txt = s"== ${n} @ ${sfDir} (${tag}) ==\n\n" +
        "---- explain(formatted), pre-execution ----\n" + formatted +
        "\n---- executed plan (AQE final) ----\n" + fin + "\n"
      Files.writeString(outDir.resolve(s"${n}_${tag}.txt"), txt)
      println(s"[explainfmt] wrote ${n}_${tag}.txt")
    }
    spark.stop()
  }
}
