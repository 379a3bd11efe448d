package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The core SCD2 (Slowly-Changing-Dimension Type 2) transform — the
  * reference's single analytics query
  * (/root/reference/duckdb/analytics/transform_scd2.py:19-61), re-expressed
  * as composable DataFrame stages.
  *
  * Semantics preserved exactly (SURVEY.md §2.8 quirks included):
  *  - key = COALESCE(after.id, before.id) (transform_scd2.py:23-26), so
  *    deletes (null `after`) keep their key via the `before` image
  *    guaranteed by REPLICA IDENTITY FULL;
  *  - rows with null op are dropped (:39), rows with null key are dropped
  *    (:50);
  *  - per-key total order by `source.lsn` — NOT arrival order — restored by
  *    the window sort (:47-48);
  *  - validity interval = [event ts, next event ts), open intervals closed
  *    with the sentinel (:58);
  *  - attribute columns always come from `after`, so delete events survive
  *    as a version with NULL attributes (:53-56) — a deliberate reference
  *    quirk the oracle checks;
  *  - `operation_type` is computed (:29-35) then dropped from the final
  *    projection — also preserved.
  *
  * Scale notes: the whole job has exactly ONE shuffle — the hash exchange
  * on the key under the window. At 100 TB the lake glob is
  * partition-pruned (year=/month=/day= dirs), the JSON parse is a single
  * `from_json` per line (not N json-path re-parses), and the window state
  * per key is O(versions-per-key), which AQE re-balances if key skew
  * appears. No driver-side collection anywhere.
  */
object Scd2 {

  /** Sentinel closing open validity intervals (transform_scd2.py:58). */
  val DefaultSentinel: Timestamp = graft.Ts.utc("9999-01-01 00:00:00")

  /** op-code → label mapping (transform_scd2.py:29-35). Note P14
    * (SURVEY.md §2.2): the reference matches json-quoted `'"c"'` because
    * DuckDB's `json_extract` returns quoted scalars; with a typed
    * `from_json` parse Spark yields the unquoted value, so we match on the
    * bare code — a documented, output-invariant normalization.
    */
  def operationType(op: Column): Column =
    when(op === "c", "CREATE")
      .when(op === "u", "UPDATE")
      .when(op === "d", "DELETE")
      .when(op === "r", "SNAPSHOT")
      .otherwise("INVALID")

  /** Stage 1 — `cdc_events` CTE (transform_scd2.py:21-39): flatten parsed
    * envelopes into the change-event relation.
    *
    * Input: envelope-shaped rows (see [[CdcSchemas.envelope]]).
    * Output: `id, before_row_value, after_row_value, operation_type,
    * log_seq_num, source_timestamp`.
    */
  def cdcEvents(envelopes: DataFrame, keyField: String = "id"): DataFrame =
    envelopes
      .filter(col("payload.op").isNotNull)
      .select(
        coalesce(
          col(s"payload.after.$keyField").cast(IntegerType),
          col(s"payload.before.$keyField").cast(IntegerType)).as("id"),
        col("payload.before").as("before_row_value"),
        col("payload.after").as("after_row_value"),
        operationType(col("payload.op")).as("operation_type"),
        col("payload.source.lsn").cast(LongType).as("log_seq_num"),
        timestamp_millis(col("payload.ts_ms")).as("source_timestamp"))

  /** Stage 2 — `ranked_events` CTE (transform_scd2.py:41-50): per-key
    * ordering and next-change lookahead. The one shuffle in the job.
    */
  def rankedEvents(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy("log_seq_num")
    events
      .filter(col("id").isNotNull)
      .select(
        col("id"),
        col("after_row_value"),
        col("log_seq_num"),
        col("source_timestamp"),
        row_number().over(w).as("row_num"),
        lead("source_timestamp", 1).over(w).as("next_change_timestamp"))
  }

  /** Stage 3 — final projection (transform_scd2.py:52-60): one history row
    * per event, attributes from the `after` image, sentinel-closed
    * intervals. `attrs` maps output column name → extractor over
    * `after_row_value` (defaults to plain field access).
    */
  def history(ranked: DataFrame, attrFields: Seq[String],
              sentinel: Timestamp = DefaultSentinel): DataFrame = {
    val attrs = attrFields.map(f => col(s"after_row_value.$f").as(f))
    val sentinelLit = lit(sentinel).cast(ranked.schema("source_timestamp").dataType)
    ranked.select(
      col("id") +:
      attrs :+
      col("source_timestamp").as("row_valid_start_timestamp") :+
      coalesce(col("next_change_timestamp"), sentinelLit)
        .as("row_valid_expiration_timestamp"): _*)
  }

  /** The full reference pipeline: envelopes → SCD2 history table.
    * `ORDER BY id, row_valid_start_timestamp` (transform_scd2.py:60) is a
    * presentation-order artifact of the CTAS; callers that need the
    * deterministic file order apply [[presentationOrder]] at write time.
    */
  def transform(envelopes: DataFrame, attrFields: Seq[String],
                keyField: String = "id",
                sentinel: Timestamp = DefaultSentinel): DataFrame =
    history(rankedEvents(cdcEvents(envelopes, keyField)), attrFields, sentinel)

  def presentationOrder(scd2: DataFrame): DataFrame =
    scd2.orderBy("id", "row_valid_start_timestamp")

  /** Generic SCD2 versionization of any keyed change log: per-key
    * `version_num` (W1), validity interval [tsCol, next tsCol) closed with
    * the sentinel (W2 + P7's COALESCE). This is the reference algorithm
    * (transform_scd2.py:41-58) abstracted over schema — one shuffle on
    * `keyCol`.
    */
  def versionize(changeLog: DataFrame, keyCol: String, seqCol: String,
                 tsCol: String, sentinel: Timestamp = DefaultSentinel): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(seqCol)
    // cast the sentinel to the ts column's own type: a bare Timestamp
    // literal is TIMESTAMP_LTZ and would coerce an NTZ validity chain to
    // LTZ (which parquet then stores as legacy INT96)
    val sentinelLit = lit(sentinel).cast(changeLog.schema(tsCol).dataType)
    changeLog
      .withColumn("version_num", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", coalesce(lead(tsCol, 1).over(w), sentinelLit))
  }

  /** Latest version per key of any keyed change log — the current-state
    * companion of [[versionize]]; used by the serving layer.
    */
  def latestByKey(changeLog: DataFrame, keyCol: String, seqCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).desc)
    changeLog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Current-state view over a history table: the open version per key
    * (serving contract, SURVEY.md §7.2 step 7).
    */
  def currentState(scd2: DataFrame,
                   sentinel: Timestamp = DefaultSentinel): DataFrame =
    scd2.filter(col("row_valid_expiration_timestamp") === lit(sentinel))

  /** Idempotence guard for at-least-once transports: drop duplicate
    * (key, lsn) events before ranking (SURVEY.md §2.8 "Delivery").
    */
  def dedupeEvents(events: DataFrame): DataFrame =
    events.dropDuplicates("id", "log_seq_num")

  /** Current state with deleted keys removed. The reference's history keeps
    * a NULL-attribute version for deletes (§2.8 quirk, preserved in
    * [[history]]); serving users usually want the live rows only — a key is
    * live iff its open version has any non-null attribute.
    */
  def currentStateLive(scd2: DataFrame, attrFields: Seq[String],
                       sentinel: Timestamp = DefaultSentinel): DataFrame = {
    require(attrFields.nonEmpty,
      "currentStateLive needs at least one attribute column to detect deletes")
    currentState(scd2, sentinel)
      .filter(attrFields.map(col(_).isNotNull).reduce(_ || _))
  }
}
