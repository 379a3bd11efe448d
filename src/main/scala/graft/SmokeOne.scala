package graft

/** Dev-only: time named catalog queries on the sf0.1 lake and a scaled
  * copy (default 10×), print the ratios — the local replica of the
  * driver's superlinearity gate for a subset (full run: Bench). A larger
  * factor (30, 100) extends the trend line: a ratio that tracks the
  * factor across 10× → 100× is measured linearity, which one 10× point
  * can only suggest.
  *   runMain graft.SmokeOne <sfDir> <name1,name2,...> [factor]
  */
object SmokeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // distinct: a repeated name (or trailing comma artifact) would print
    // the same query twice and read like two divergent measurements
    val names = args(1).split(",").toSeq.filter(_.nonEmpty).distinct
    val factor = if (args.length > 2) args(2).toInt else ScaleSmoke.Factor
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val scaled = ScaleSmoke.ensureScaled(spark, sfDir, factor = factor)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // (best-of-2 seconds, last-run shuffle MB — bytes are
      // plan-deterministic, so they are the box-noise-free signal)
      def time(d: String): (Double, Double, Seq[String]) = {
        var mb = 0.0
        var audit = Seq.empty[String]
        val ts = (1 to 2).map { _ =>
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
          sec
        }
        (ts.min, mb, audit)
      }
      val (t1, mb1, a1) = time(sfDir); val (t10, mb10, a10) = time(scaled)
      println(f"[smoke] $n%-32s head=$t1%7.2fs x$factor%d=$t10%7.2fs ratio=${t10 / t1}%6.2f shuffleMB=$mb1%8.1f -> $mb10%8.1f")
      a10.foreach(h => println(s"[smoke]   audit@x$factor: $h"))
      a1.foreach(h => println(s"[smoke]   audit@head: $h"))
    }
    spark.stop()
  }
}
