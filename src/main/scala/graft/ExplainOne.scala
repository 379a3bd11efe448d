package graft
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSet
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.all.filter(q => names(q.name)).foreach { q =>
      val df = q.spark(spark, sfDir)
      df.collect()  // force AQE final plan
      println(s"== ${q.name} ==")
      println(df.queryExecution.executedPlan.toString
        .take(sys.env.getOrElse("EXPLAIN_MAX", "8000").toInt))
    }
    spark.stop()
  }
}
