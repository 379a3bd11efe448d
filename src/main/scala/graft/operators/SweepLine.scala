package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap analytics via sweep-line: the scale-safe shape for
  * "how many intervals are open at once" questions. A quadratic range
  * self-join materializes every overlapping pair; the sweep unions +1/-1
  * boundary events and takes a per-key running sum — one shuffle, linear
  * output, and the final per-key aggregation reuses the window's hash
  * partitioning (no second exchange; see PLANS.md `interval_overlap_sweep`).
  */
object SweepLine {

  /** Max concurrent open intervals per key, where each input row opens an
    * interval `[startCol, startCol + duration)`. End events sort before
    * start events at equal timestamps (delta ASC), making the running
    * count end-exclusive. Output: keyCol, max_open, n_intervals.
    */
  def maxConcurrent(df: DataFrame, keyCol: String, startCol: String,
                    duration: Column): DataFrame = {
    val sweep = df.select(col(keyCol), col(startCol).as("ts"), lit(1L).as("delta"))
      .unionByName(df.select(col(keyCol), (col(startCol) + duration).as("ts"),
        lit(-1L).as("delta")))
    val run = Window.partitionBy(keyCol).orderBy(col("ts"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sweep.withColumn("open", sum(col("delta")).over(run))
      .groupBy(keyCol)
      .agg(max(col("open")).as("max_open"),
           sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_intervals"))
  }
}
