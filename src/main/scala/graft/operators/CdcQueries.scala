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
