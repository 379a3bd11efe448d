package graft.operators

import graft.QueryDef
import graft.QueryDef.t
import graft.cdc.{CdcSchemas, EnvelopeReader, Scd2}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The envelope-level CDC path under the driver's oracle gate.
  *
  * The driver's tables are parquet, but the reference's flagship job reads
  * Debezium NDJSON (transform_scd2.py:38). To put that exact path under the
  * hash-compare: the query derives a deterministic envelope lake from the
  * `events` table (op codes, before/after images, LSN = event_id), writes
  * it as NDJSON to a scratch dir, and runs the full
  * readEnvelopes→cdcEvents→rankedEvents→history pipeline over it; the
  * DuckDB oracle reads the same files with read_ndjson_objects + the
  * reference's own json_extract/CASE/window SQL (adapted only in the
  * timestamp constructor, which must stay timezone-free).
  */
object EnvelopeQueries {

  /** Fixed scratch path: the oracle SQL is dumped before the driver picks a
    * scale factor, so the lake lives at one well-known dir, overwritten by
    * each run (verify runs are per-sf and sequential; the oracle always
    * reads the lake its paired Spark run just wrote).
    */
  private def lakeDir(sfDir: String): String = "/tmp/graft_cdc_lake"

  /** Derive Debezium envelopes from `events`: signup→c, purchase/click→u,
    * error→d (before image only), view→r. ~events-per-user versions.
    */
  private def buildLake(s: SparkSession, sfDir: String): String = {
    val dir = lakeDir(sfDir)
    val ev = t(s, sfDir, "events")
    val row = struct(
      col("user_id").cast("int").as("id"),
      col("event_type").as("name"),
      col("props").as("description"),
      col("value").as("price"))
    val op = when(col("event_type") === "signup", "c")
      .when(col("event_type") === "error", "d")
      .when(col("event_type") === "view", "r")
      .otherwise("u")
    val nullRow = lit(null).cast(CdcSchemas.productsRow)
    val env = ev.select(to_json(struct(struct(
      when(op === "d", row).otherwise(nullRow).as("before"),
      when(op =!= "d", row).otherwise(nullRow).as("after"),
      op.as("op"),
      unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
      struct(col("event_id").as("lsn")).as("source")).as("payload"))).as("value"))
    env.coalesce(4).write.mode("overwrite").text(dir)
    // .text writes part-*.txt… actually .txt files; rename glob handled below
    dir
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "cdc_envelope_scd2",
      (s, d) => {
        val dir = buildLake(s, d)
        val env = EnvelopeReader.readEnvelopes(s, dir + "/part-*", CdcSchemas.productsRow)
        Scd2.transform(env, Seq("name", "description", "price"))
          .select(col("id"), col("name"), col("description"), col("price"),
            col("row_valid_start_timestamp").cast("timestamp_ntz").as("row_valid_start_timestamp"),
            col("row_valid_expiration_timestamp").cast("timestamp_ntz").as("row_valid_expiration_timestamp"))
      },
      Some {
        // The reference SCD2 query (transform_scd2.py:19-61) verbatim in
        // structure; only the source glob and the epoch→timestamp
        // constructor differ (make_timestamp is timezone-free where
        // DuckDB's to_timestamp would yield TIMESTAMPTZ in the driver's
        // unknown session zone). Note the '"c"' quoted-scalar matching —
        // DuckDB's json_extract returns quoted JSON scalars (SURVEY P14).
        val glob = "/tmp/graft_cdc_lake"
        s"""WITH cdc_events AS (
           |  SELECT
           |    COALESCE(
           |      CAST(json_extract(json, '$$.payload.after.id') AS INT),
           |      CAST(json_extract(json, '$$.payload.before.id') AS INT)) AS id,
           |    json_extract(json, '$$.payload.before') AS before_row_value,
           |    json_extract(json, '$$.payload.after') AS after_row_value,
           |    CASE json_extract(json, '$$.payload.op')
           |      WHEN '"c"' THEN 'CREATE'
           |      WHEN '"u"' THEN 'UPDATE'
           |      WHEN '"d"' THEN 'DELETE'
           |      WHEN '"r"' THEN 'SNAPSHOT'
           |      ELSE 'INVALID' END AS operation_type,
           |    CAST(json_extract(json, '$$.payload.source.lsn') AS BIGINT) AS log_seq_num,
           |    make_timestamp(CAST(json_extract(json, '$$.payload.ts_ms') AS BIGINT) * 1000) AS source_timestamp
           |  FROM read_ndjson_objects('$glob/part-*')
           |  WHERE json_extract(json, '$$.payload.op') IS NOT NULL),
           |ranked_events AS (
           |  SELECT id, after_row_value, log_seq_num, source_timestamp,
           |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY log_seq_num) AS row_num,
           |    LEAD(source_timestamp) OVER (PARTITION BY id ORDER BY log_seq_num) AS next_change_timestamp
           |  FROM cdc_events WHERE id IS NOT NULL)
           |SELECT id,
           |  CAST(json_extract_string(after_row_value, '$$.name') AS VARCHAR) AS name,
           |  CAST(json_extract_string(after_row_value, '$$.description') AS VARCHAR) AS description,
           |  CAST(json_extract(after_row_value, '$$.price') AS DOUBLE) AS price,
           |  source_timestamp AS row_valid_start_timestamp,
           |  COALESCE(next_change_timestamp, TIMESTAMP '9999-01-01') AS row_valid_expiration_timestamp
           |FROM ranked_events""".stripMargin
      }))
}
