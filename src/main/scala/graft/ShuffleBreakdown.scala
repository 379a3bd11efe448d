package graft

/** Dev-only: run one catalog query and print every exchange's shuffle
  * bytes-written metric from the final adaptive plan — the per-node
  * version of ShuffleMeter's global counter, for attributing a query's
  * exchange volume to specific plan nodes.
  *   runMain graft.ShuffleBreakdown <dir> <name[,name...]>
  */
object ShuffleBreakdown {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSet
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    // per-job wall time + shuffle bytes: attributes cost to the eager
    // checkpoint jobs that never appear in the final adaptive plan
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("").take(80))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs.synchronized { jobs += ((j.jobId, (System.nanoTime() - t0) / 1e9, d)) }
        }
    })
    SparkEntry.all.filter(q => names(q.name)).foreach { q =>
      jobs.synchronized(jobs.clear())
      val df = q.spark(spark, dir)
      df.collect()
      println(s"== ${q.name} ==")
      org.apache.spark.GraftSparkInternals.drainListenerBus(spark.sparkContext)
      jobs.synchronized(jobs.toSeq).sortBy(-_._2).take(12).foreach { case (id, sec, d) =>
        println(f"  job $id%3d $sec%7.2fs  $d")
      }
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(s.plan)
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            val mb = e.metrics.get("shuffleBytesWritten")
              .orElse(e.metrics.get("bytesWritten")).map(_.value / 1e6).getOrElse(-1.0)
            val rows = e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(-1L)
            println(f"  exchange $mb%9.1f MB $rows%12d rows  <- ${e.child.nodeName}")
            e.children.foreach(walk)
          case other => other.children.foreach(walk)
        }
      }
      walk(df.queryExecution.executedPlan)
    }
    spark.stop()
  }
}
