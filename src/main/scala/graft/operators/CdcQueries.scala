package graft.operators

import graft.QueryDef
import graft.QueryDef.t
import graft.cdc.Scd2

import org.apache.spark.sql.functions._

/** The reference's CDC/SCD2 semantics (SURVEY.md §2.2/§2.5/§2.7) expressed
  * over the driver's `events` change log (event_id = LSN analogue, user_id =
  * entity key, ts = source timestamp) so the DuckDB oracle can check them.
  * The envelope-level NDJSON path is exercised by the ScalaTest suite on
  * synthetic Debezium fixtures (FIXTURES.md §1); the window/ordering/sentinel
  * algebra checked here is identical (`Scd2.versionize` is the same code
  * path).
  */
object CdcQueries {

  private val sentinelSql = "TIMESTAMP '9999-01-01 00:00:00'"

  val defs: Seq[QueryDef] = Seq(

    // W1 + W2 + P7: the SCD2 history algorithm (transform_scd2.py:41-58).
    QueryDef(
      "scd2_history",
      (s, d) => Scd2.versionize(t(s, d, "events"), "user_id", "event_id", "ts")
        .select("user_id", "event_id", "event_type", "value",
                "version_num", "valid_from", "valid_to"),
      Some(s"""SELECT user_id, event_id, event_type, value,
              |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS version_num,
              |  ts AS valid_from,
              |  COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY event_id), $sentinelSql) AS valid_to
              |FROM events""".stripMargin)),

    // Current-state view: last change per key (serving layer, SURVEY.md §3 E3).
    QueryDef(
      "scd2_current",
      (s, d) => Scd2.latestByKey(t(s, d, "events"), "user_id", "event_id")
        .select("user_id", "event_id", "event_type", "value", "ts"),
      Some("""SELECT user_id, event_id, event_type, value, ts
             |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
             |      FROM events) WHERE rn = 1""".stripMargin)),

    // P6 CASE WHEN op mapping + P7 COALESCE + P8 CAST + P3 IS NOT NULL
    // (transform_scd2.py:29-35 op-code mapping shape).
    QueryDef(
      "cdc_op_mapping",
      (s, d) => t(s, d, "events")
        .filter(col("event_type").isNotNull)
        .select(
          col("event_id"),
          when(col("event_type") === "signup", "CREATE")
            .when(col("event_type") === "purchase", "UPDATE")
            .when(col("event_type") === "click", "UPDATE")
            .when(col("event_type") === "error", "DELETE")
            .otherwise("INVALID").as("operation_type"),
          coalesce(col("value"), lit(0.0)).as("value_filled"),
          col("user_id").cast("int").as("user_id_int")),
      Some("""SELECT event_id,
             |  CASE event_type WHEN 'signup' THEN 'CREATE' WHEN 'purchase' THEN 'UPDATE'
             |       WHEN 'click' THEN 'UPDATE' WHEN 'error' THEN 'DELETE'
             |       ELSE 'INVALID' END AS operation_type,
             |  COALESCE(value, 0.0) AS value_filled,
             |  CAST(user_id AS INT) AS user_id_int
             |FROM events WHERE event_type IS NOT NULL""".stripMargin)),

    // P9 JSON path extraction (json_extract ↔ get_json_object, quirk P14
    // normalized: both sides cast the scalar, so quoting differences vanish).
    QueryDef(
      "cdc_json_extract",
      (s, d) => t(s, d, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
             |FROM events""".stripMargin)),

    // Point-in-time (time-travel) read of the SCD2 history: the state of
    // every entity AS OF a wall-clock instant is the version whose
    // validity interval covers it — the query a consumer of the
    // reference's products_scd2 table runs to reconstruct "the table as
    // it was on the 15th" (SURVEY.md §1.4; the interval algebra is
    // transform_scd2.py:47-58's). One window shuffle, then a filter that
    // keeps exactly one row per key present before T.
    QueryDef(
      "scd2_asof_snapshot",
      (s, d) => {
        val at = lit("2024-01-15 12:00:00").cast("timestamp_ntz")
        Scd2.versionize(t(s, d, "events"), "user_id", "event_id", "ts")
          .filter(col("valid_from") <= at && col("valid_to") > at)
          .select("user_id", "event_id", "event_type", "value",
                  "valid_from", "valid_to")
      },
      Some(s"""WITH v AS (
              |  SELECT user_id, event_id, event_type, value,
              |    ts AS valid_from,
              |    COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY event_id),
              |             $sentinelSql) AS valid_to
              |  FROM events)
              |SELECT user_id, event_id, event_type, value, valid_from, valid_to
              |FROM v
              |WHERE valid_from <= TIMESTAMP '2024-01-15 12:00:00'
              |  AND valid_to   >  TIMESTAMP '2024-01-15 12:00:00'""".stripMargin)),

    // Snapshot diff audit: what changed between two points in time. The
    // state at each instant is an argmax aggregate (max_by over events at
    // or before T) — ONE shuffle computes both snapshots side by side via
    // FILTER clauses, instead of two window passes + a self-join. The
    // classification CASE is the audit report a CDC consumer reconciles
    // replicas with (appeared / changed / unchanged — this change log has
    // no deletes; a delete would surface as t2-side NULL).
    QueryDef(
      "scd2_snapshot_diff",
      (s, d) => {
        val t1 = "2024-01-15 12:00:00"
        val t2 = "2024-01-25 12:00:00"
        t(s, d, "events")
          .groupBy("user_id")
          .agg(
            expr(s"max_by(event_id, event_id) FILTER (WHERE ts <= TIMESTAMP '$t1')").as("event_id_t1"),
            expr(s"max_by(value, event_id)    FILTER (WHERE ts <= TIMESTAMP '$t1')").as("value_t1"),
            expr(s"max_by(event_id, event_id) FILTER (WHERE ts <= TIMESTAMP '$t2')").as("event_id_t2"),
            expr(s"max_by(value, event_id)    FILTER (WHERE ts <= TIMESTAMP '$t2')").as("value_t2"))
          .select(col("user_id"), col("event_id_t1"), col("value_t1"),
            col("event_id_t2"), col("value_t2"),
            when(col("event_id_t1").isNull && col("event_id_t2").isNotNull, "appeared")
              .when(col("event_id_t1") === col("event_id_t2"), "unchanged")
              .otherwise("changed").as("change_kind"))
      },
      Some("""SELECT user_id,
             |  arg_max(event_id, event_id) FILTER (ts <= TIMESTAMP '2024-01-15 12:00:00') AS event_id_t1,
             |  arg_max(value, event_id)    FILTER (ts <= TIMESTAMP '2024-01-15 12:00:00') AS value_t1,
             |  arg_max(event_id, event_id) FILTER (ts <= TIMESTAMP '2024-01-25 12:00:00') AS event_id_t2,
             |  arg_max(value, event_id)    FILTER (ts <= TIMESTAMP '2024-01-25 12:00:00') AS value_t2,
             |  CASE WHEN arg_max(event_id, event_id) FILTER (ts <= TIMESTAMP '2024-01-15 12:00:00') IS NULL
             |        AND arg_max(event_id, event_id) FILTER (ts <= TIMESTAMP '2024-01-25 12:00:00') IS NOT NULL
             |       THEN 'appeared'
             |       WHEN arg_max(event_id, event_id) FILTER (ts <= TIMESTAMP '2024-01-15 12:00:00')
             |          = arg_max(event_id, event_id) FILTER (ts <= TIMESTAMP '2024-01-25 12:00:00')
             |       THEN 'unchanged'
             |       ELSE 'changed' END AS change_kind
             |FROM events GROUP BY user_id""".stripMargin)),

    // CDC log compaction (net changes): collapse each key's intra-day
    // churn to the LAST change of that day — the "net effect" a
    // downstream consumer applies when replaying at day granularity
    // (Kafka log-compaction semantics, windowed). An argmax aggregate:
    // map-side combine ships one candidate per (key, day) per partition,
    // one shuffle total; n_collapsed reports the churn removed.
    QueryDef(
      "cdc_net_changes",
      (s, d) => t(s, d, "events")
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(
          max_by(struct(col("event_id"), col("event_type"), col("value")),
                 col("event_id")).as("last"),
          count(lit(1)).as("n_collapsed"))
        .select(col("user_id"), col("day"),
          col("last.event_id").as("event_id"),
          col("last.event_type").as("event_type"),
          col("last.value").as("value"),
          col("n_collapsed")),
      Some("""SELECT user_id, CAST(ts AS DATE) AS day,
             |  arg_max(event_id, event_id) AS event_id,
             |  arg_max(event_type, event_id) AS event_type,
             |  arg_max(value, event_id) AS value,
             |  count(*) AS n_collapsed
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // MERGE INTO semantics on vanilla parquet (the S11 generalization:
    // SURVEY §2.1 documents MERGE as the Delta-only alternative to
    // read-modify-overwrite — this is the read-modify half as one
    // declarative plan). The change set is the CDC net change per key
    // (argmax, as cdc_net_changes); the merge is a single full-outer
    // join: matched+delete drops the row, matched+update rewrites the
    // balance, unmatched change inserts, untouched base rows persist.
    // All three MERGE branches are exercised (the +1400 key shift makes
    // the change set straddle the base key range). One shuffle per side.
    QueryDef(
      "merge_into_upsert",
      (s, d) => {
        val base = t(s, d, "customer")
          .select(col("c_custkey").as("key"), col("c_acctbal").as("balance"))
        val changes = t(s, d, "events")
          .groupBy((col("user_id") + 1400L).as("key"))
          .agg(max_by(struct(col("event_type"), col("value")), col("event_id")).as("c"))
          .select(col("key"),
            when(col("c.event_type") === "error", "D").otherwise("U").as("op"),
            col("c.value").as("new_balance"))
        base.join(changes, Seq("key"), "full_outer")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(col("key"),
            coalesce(col("new_balance"), col("balance")).as("balance"),
            when(col("op").isNull, "kept")
              .when(col("balance").isNull, "inserted")
              .otherwise("updated").as("merge_action"))
      },
      Some("""WITH changes AS (
             |  SELECT user_id + 1400 AS key,
             |    CASE WHEN arg_max(event_type, event_id) = 'error'
             |         THEN 'D' ELSE 'U' END AS op,
             |    arg_max(value, event_id) AS new_balance
             |  FROM events GROUP BY 1),
             |base AS (SELECT c_custkey AS key, c_acctbal AS balance FROM customer)
             |SELECT key,
             |  COALESCE(new_balance, balance) AS balance,
             |  CASE WHEN op IS NULL THEN 'kept'
             |       WHEN balance IS NULL THEN 'inserted'
             |       ELSE 'updated' END AS merge_action
             |FROM base FULL OUTER JOIN changes USING (key)
             |WHERE op IS NULL OR op != 'D'""".stripMargin)),

    // P10/P13 epoch-ms → timestamp with the reference's ts_ms/1000 shape
    // (transform_scd2.py:37), floored to whole seconds for engine-exactness.
    // Both sides stay timezone-free: Spark emits TIMESTAMP_NTZ (cast under
    // the UTC session), the oracle uses make_timestamp (naive) rather than
    // to_timestamp (which would yield TIMESTAMPTZ and depend on the
    // driver's session zone).
    QueryDef(
      "cdc_epoch_roundtrip",
      (s, d) => t(s, d, "events")
        .select(
          col("event_id"),
          expr("CAST(timestamp_seconds(CAST(floor(unix_millis(CAST(ts AS TIMESTAMP)) / 1000) AS BIGINT)) AS TIMESTAMP_NTZ)")
            .as("ts_sec")),
      Some("""SELECT event_id,
             |  make_timestamp(CAST(floor(epoch_ms(ts) / 1000) AS BIGINT) * 1000000) AS ts_sec
             |FROM events""".stripMargin)))
}
