package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NULL-key pin for quality_percentile_norm's histogram decomposition
  * (ADVICE r14): the join-back from the per-(lang, n_chars) rank
  * histogram must be NULL-SAFE — an inner equi-join would silently DROP
  * any document with a NULL lang or n_chars while the oracle's
  * percent_rank() window still ranks them. The production lakes carry no
  * NULLs, so Verify could never catch the divergence; this spec crafts
  * the NULL-bearing frame directly and asserts the catalog query equals
  * Spark's own percent_rank window (asc_nulls_first, matching both the
  * decomposition's cumulative window and the oracle's pinned
  * NULLS FIRST) row for row, with zero rows lost.
  */
class AnalyticsNullSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val d = graft.SparkSuite.scratchDir("graft-nulls") // self-cleaning (ADVICE r15)
    Seq(
      (1L, Some("en"), Some(10L)),
      (2L, Some("en"), Some(10L)), // tie — shares 10's rank
      (3L, Some("en"), Some(20L)),
      (4L, Some("en"), None), // NULL n_chars: first under NULLS FIRST, pr=0
      (5L, None, Some(10L)), // NULL lang: its own partition on both engines
      (6L, None, Some(30L)),
      (7L, None, None), // NULL on both keys
      (8L, Some("fr"), Some(5L))) // singleton partition: pr = 0, no 0/0
      .toDF("doc_id", "lang", "n_chars")
      .withColumn("text", lit("x")).withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("quality_percentile_norm keeps NULL lang/n_chars rows and matches the direct window") {
    val got = graft.SparkEntry.queries("quality_percentile_norm")(spark, dir)
    assert(got.count() === 8L) // the inner-join form drops 3 of these
    val w = Window.partitionBy("lang").orderBy(asc_nulls_first("n_chars"))
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        percent_rank().over(w).as("pr"))
    // exact equality: both sides compute pr as the same IEEE division
    // (rank-1)/(n-1) over exact integers
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
  }
}
