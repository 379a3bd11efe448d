package graft.operators

import graft.QueryDef
import graft.QueryDef.t

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Serving-layer analytics beyond the reference's authored surface
  * (SURVEY.md §2.4 notes Superset issues ad-hoc aggregates at viz time):
  * hierarchical rollups, time-bucketed aggregation, sessionization, and
  * sketch-based distincts.
  */
object AnalyticsQueries {

  val defs: Seq[QueryDef] = Seq(

    // ROLLUP hierarchy (grouping-set family). Decimal-exact sums.
    QueryDef(
      "rollup_agg",
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
             sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Tumbling event-time windows — Spark's streaming-compatible window()
    // operator; 1-hour epoch-aligned buckets equal date_trunc on the oracle
    // side.
    QueryDef(
      "window_tumbling_agg",
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .select(col("window.start").as("hour_start"), col("event_type"),
                col("n_events"), col("sum_value")),
      Some("""SELECT date_trunc('hour', ts) AS hour_start, event_type,
             |  count(*) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Sessionization: 30-minute inactivity gap → new session (LAG + running
    // conditional sum — the batch shape of streaming session windows).
    QueryDef(
      "events_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val prevTs = lag(col("ts"), 1).over(byUser)
        val isNew = when(prevTs.isNull ||
          (unix_millis(col("ts").cast("timestamp")) -
           unix_millis(prevTs.cast("timestamp"))) > 1800000L, 1L).otherwise(0L)
        t(s, d, "events")
          .withColumn("session_seq", sum(isNew).over(run))
          .select("user_id", "event_id", "session_seq")
      },
      Some("""SELECT user_id, event_id,
             |  SUM(CASE WHEN prev_ts IS NULL
             |           OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
             |FROM (SELECT user_id, event_id, ts,
             |        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |      FROM events)""".stripMargin)),

    // GROUPING SETS through the raw spark.sql entry point (the E3 serving
    // contract: tables queryable by name; Catalyst expands the sets the
    // same way DuckDB does).
    QueryDef(
      "grouping_sets_sql",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
                |FROM orders_v
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // HLL sketch distincts — the 100 TB path for cardinality (no exact
    // shuffle-the-universe). Sketch internals differ across engines, so no
    // SQL oracle: the driver records the rows-only check; the test suite
    // asserts the estimate lands within rsd of the exact count.
    QueryDef(
      "approx_distinct_users",
      (s, d) => t(s, d, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
             count(lit(1)).as("n")),
      None))
}
