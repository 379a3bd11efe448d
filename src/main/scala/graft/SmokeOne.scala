package graft

/** Dev-only: time named catalog queries on the sf0.1 lake and a scaled
  * copy (default 10×), print the ratios — the local replica of the
  * driver's superlinearity gate for a subset (full run: Bench). A larger
  * factor (30, 100) extends the trend line: a ratio that tracks the
  * factor across 10× → 100× is measured linearity, which one 10× point
  * can only suggest.
  *
  * `--profile` also prints a [[StageProfile.Meter]] digest (top stages:
  * task balance, GC share, spill, shuffle) for each query's SCALED run —
  * captured from the same execution that produced the reported minimum
  * wall, so a trend-gate flag arrives with its adjudication readout
  * attached instead of waiting for a hand-run StageProfile under
  * different box conditions (VERDICT r15 task #5).
  *
  *   runMain graft.SmokeOne <sfDir> <name1,name2,...> [factor] [--profile]
  */
object SmokeOne {
  def main(args: Array[String]): Unit = {
    val profile = args.contains("--profile")
    val pos = args.filterNot(_.startsWith("--"))
    val sfDir = pos(0)
    // distinct: a repeated name (or trailing comma artifact) would print
    // the same query twice and read like two divergent measurements
    val names = pos(1).split(",").toSeq.filter(_.nonEmpty).distinct
    val factor = if (pos.length > 2) pos(2).toInt else ScaleSmoke.Factor
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val stageMeter = new StageProfile.Meter
    if (profile) spark.sparkContext.addSparkListener(stageMeter)
    val scaled = ScaleSmoke.ensureScaled(spark, sfDir, factor = factor)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // (best-of-2 seconds, last-run shuffle MB — bytes are
      // plan-deterministic, so they are the box-noise-free signal; the
      // stage digest rides the run that produced the reported minimum)
      def time(d: String): (Double, Double, Seq[String], Seq[String]) = {
        var mb = 0.0
        var audit = Seq.empty[String]
        val runs = (1 to 2).map { _ =>
          if (profile) {
            org.apache.spark.GraftSparkInternals.drainListenerBus(spark.sparkContext)
            stageMeter.reset()
          }
          val b0 = meter.snapshot(spark.sparkContext)
          val t0 = System.nanoTime()
          // Materialize.force executes df's OWN plan fully (no derived
          // count that would prune windows/sorts — see Materialize) and
          // finalizes its AdaptiveSparkPlan, so the audit below walks the
          // plan that actually RAN
          val df = fn(spark, d); Materialize.force(df)
          val sec = (System.nanoTime() - t0) / 1e9
          mb = (meter.snapshot(spark.sparkContext) - b0) / 1e6
          // same FINAL-adaptive-plan cliff sweep the bench smoke emits —
          // the adjudication tool must see what the graded artifact sees
          audit = try ScaleAudit.audit(df.queryExecution.executedPlan)
          catch { case e: Throwable => Seq(s"AUDIT-ERROR: ${e.getMessage}") }
          val dig = if (profile) {
            org.apache.spark.GraftSparkInternals.drainListenerBus(spark.sparkContext)
            stageMeter.digest()
          } else Seq.empty[String]
          (sec, dig)
        }
        val best = runs.minBy(_._1)
        (best._1, mb, audit, best._2)
      }
      val (t1, mb1, a1, _) = time(sfDir)
      val (t10, mb10, a10, dig10) = time(scaled)
      println(f"[smoke] $n%-32s head=$t1%7.2fs x$factor%d=$t10%7.2fs ratio=${t10 / t1}%6.2f shuffleMB=$mb1%8.1f -> $mb10%8.1f")
      a10.foreach(h => println(s"[smoke]   audit@x$factor: $h"))
      a1.foreach(h => println(s"[smoke]   audit@head: $h"))
      dig10.foreach(l => println(s"[smoke]   profile@x$factor: $l"))
    }
    spark.stop()
  }
}
