package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("binned range join == brute-force theta join (random intervals)") {
    val rnd = new scala.util.Random(42)
    val points = (1 to 500).map(i => (i.toLong, rnd.nextLong(100000L))).toDF("pt_id", "pt")
    val intervals = (1 to 80).map { i =>
      val s = rnd.nextLong(100000L)
      (i.toLong, s, s + rnd.nextLong(5000L)) // spans 0..5k, bins of 1k → multi-bin
    }.toDF("iv_id", "s", "e")

    val binned = RangeJoin.pointInInterval(points, intervals, "pt", "s", "e", binWidth = 1000L)
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val brute = points.crossJoin(intervals)
      .filter(col("pt") >= col("s") && col("pt") < col("e"))
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(binned.toSeq == brute.toSeq, "binned join must equal the theta join exactly")
  }

  test("boundary semantics: start inclusive, end exclusive, no duplicate pairs") {
    val points = Seq((1L, 1000L), (2L, 1999L), (3L, 2000L), (4L, 999L)).toDF("pt_id", "pt")
    val intervals = Seq((10L, 1000L, 2000L)).toDF("iv_id", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals, "pt", "s", "e", binWidth = 100L)
      .select("pt_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 2L), "in [start, end): 1000 in, 1999 in, 2000 out, 999 out")
    // a point inside an interval spanning many bins must appear exactly once
    val wide = Seq((20L, 0L, 10000L)).toDF("iv_id", "s", "e")
    val once = RangeJoin.pointInInterval(points, wide, "pt", "s", "e", binWidth = 100L)
    assert(once.count() == 4 && once.select("pt_id").distinct().count() == 4)
  }

  test("plan is a shuffled equi-join on the bin — no nested loop, no cartesian") {
    val points = spark.range(1000).select(col("id").as("pt_id"), (col("id") * 97).as("pt"))
    val intervals = spark.range(1000)
      .select(col("id").as("iv_id"), (col("id") * 91).as("s"), (col("id") * 91 + 500).as("e"))
    val plan = RangeJoin.pointInInterval(points, intervals, "pt", "s", "e", binWidth = 500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not plan as a nested loop:\n$plan")
  }
}
