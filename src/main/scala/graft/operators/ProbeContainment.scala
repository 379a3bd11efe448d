package graft.operators

import org.apache.spark.sql.functions._

/** Dev-only adjudication probe (VERDICT r14 task #1 follow-through): the
  * containment candidate join's RAW match volume — Σ_tid |prefA(tid)| ×
  * |prefB(tid)| — before the map-side partial aggregate absorbs it. The
  * sweep's byte metrics only see the aggregated (ida, idb) pairs, so a
  * superlinear raw-match blowup is invisible in mb_trend while burning
  * CPU quadratically: exactly the class the time gate exists to catch.
  *
  *   runMain graft.operators.ProbeContainment <dir>
  */
object ProbeContainment {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.QueryDef.t(spark, dir, "documents")
    val (toks, cands) = DedupQueries.containmentBoundedCandidates(docs)
    val nCands = cands.count()
    // replay the prefix construction to get per-tid prefix cardinalities
    val freq = toks.groupBy("tid").agg(count(lit(1)).as("f"))
    val szs = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("f"), col("tid"))
    val sized = toks.join(freq.hint("shuffle_hash"), "tid")
      .join(szs.hint("shuffle_hash"), "doc_id")
      .withColumn("pos", row_number().over(wOrd))
      .localCheckpoint(true)
    val prefA = sized.filter(
      col("pos") <= col("sz") - expr("(4 * sz + 4) div 5") + 1)
      .groupBy("tid").agg(count(lit(1)).as("na"))
    val prefB = sized.filter(
      col("pos") <= col("sz") - expr("(sz + 4) div 5") + 1)
      .groupBy("tid").agg(count(lit(1)).as("nb"))
    // coalesce: sum/max over an empty join are NULL, and the empty case
    // (a lake whose docs all fall under the 3-token floor) is exactly the
    // small-lake sanity run this probe gets pointed at first
    val row = prefA.join(prefB, "tid")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("raw_matches"),
        count(lit(1)).as("n_join_tids"),
        coalesce(max(col("na") * col("nb")), lit(0L)).as("worst_tid_matches"))
      .head()
    println(s"[probe] dir=$dir cands=$nCands raw_matches=${row.getLong(0)} " +
      s"join_tids=${row.getLong(1)} worst_tid=${row.getLong(2)}")
    spark.stop()
  }
}
