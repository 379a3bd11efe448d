package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range (interval) join — the scale path for theta joins of the
  * form `point BETWEEN start AND end` with NO equi key.
  *
  * Spark's built-in planning for a pure range predicate is
  * BroadcastNestedLoopJoin (if one side is small) or CartesianProduct —
  * both quadratic in inputs and both scale-killers at 100 TB. The standard
  * fix (same idea as Databricks' range-join bin optimization and the
  * interval-bucketing literature): quantize the axis into fixed-width
  * bins; each interval is exploded into the bins it spans, each point maps
  * to exactly ONE bin, and the join becomes a shuffled equi-join on the
  * bin id followed by the exact residual predicate. One shuffle per side,
  * output-linear work; a point meets an interval in exactly one bin, so no
  * dedup pass is needed.
  *
  * `binWidth` should be on the order of the typical interval length: an
  * interval explodes into O(length / binWidth + 2) rows, while a too-large
  * width degrades bucket selectivity (more residual-filter work). Axis
  * values must be non-negative (epoch micros/millis qualify) — integer
  * `div` truncation and floor agree there.
  */
object RangeJoin {

  /** Inner join of `points` to `intervals` on
    * `points(pointCol) ∈ [intervals(startCol), intervals(endCol))`.
    * All three columns must be integral (cast timestamps to epoch micros
    * first); column names must be distinct across the two inputs.
    *
    * `equiKeys` (same names on both sides) compose with the bin id: the
    * equi+range case (per-user attribution windows, per-device sessions)
    * matters for HOT KEYS — planned as equi-join + residual filter, Spark
    * materializes |points(k)|·|intervals(k)| rows per key BEFORE the time
    * filter, quadratic in one key's mass; with the bin in the join key the
    * per-key term becomes Σ_bins |points(k,b)|·|spanning(k,b)|, bounded by
    * the bin width, and a hot key's work spreads across its bins' tasks
    * instead of one straggler (r13 SkewStress finding).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      binWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = "__graft_bin"
    val p = points.withColumn(bin, expr(s"`$pointCol` div ${binWidth}L"))
    val i = intervals.withColumn(bin, explode(sequence(
      expr(s"`$startCol` div ${binWidth}L"),
      expr(s"`$endCol` div ${binWidth}L"))))
    p.join(i, equiKeys :+ bin)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop(bin)
  }
}
