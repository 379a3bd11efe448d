package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's three alternative SCD2 formulations (SURVEY.md §2.1 S9-S11,
  * §2.3 J1-J4), re-expressed Spark-first. Vanilla parquet has no in-place
  * UPDATE, so the compare-and-close variant becomes a read-modify-overwrite:
  * compute the new full state as a DataFrame union and overwrite the table —
  * which is exactly the shape the reference's own flagship job uses
  * (full CREATE OR REPLACE rebuild, transform_scd2.py:20).
  */
object Scd2Variants {

  /** Sentinel used by the compare-and-close variant
    * (/root/reference/duckdb/analytics/init_duckdb.sh:45,63).
    */
  val VariantSentinel: Timestamp = graft.Ts.utc("9999-12-31 23:59:59")

  /** Anti-join append variant (/root/reference/duckdb/analytics/scd2.sql:7-12):
    * append incoming rows that are strictly newer than everything already in
    * history for their key. The reference writes it as LEFT JOIN on
    * `p.id = h.id AND p.updated_at <= h.updated_at` + `WHERE h.id IS NULL`
    * (null-rejecting ⇒ anti join, SURVEY.md §2.3 J1); Spark's `left_anti`
    * states that directly and plans broadcast/SMJ as sizes dictate.
    */
  def antiJoinAppend(incoming: DataFrame, history: DataFrame): DataFrame = {
    val h = history.select(col("id").as("h_id"), col("updated_at").as("h_updated_at"))
    incoming.join(
      h,
      incoming("id") === h("h_id") && incoming("updated_at") <= h("h_updated_at"),
      "left_anti")
  }

  /** Compare-and-close variant (init_duckdb.sh:39-68) as one deterministic
    * read-modify-overwrite. Semantics preserved — including the
    * reference's surprising ones (its own comment claims updates "insert a
    * new one"; its SQL does not — the SQL wins, verified in
    * Scd2VariantsSpec):
    *  - a CHANGED key is NOT re-inserted: the INSERT's NOT EXISTS (:48-53)
    *    blocks any key that has a differing current version, so changed
    *    keys only get their current version closed — the incoming value is
    *    dropped;
    *  - an IDENTICAL row IS re-inserted and the old version stays open
    *    (the predicate only blocks differing rows);
    *  - new keys insert an open version;
    *  - current versions of keys present in the batch whose attrs differ
    *    are closed (IN + EXISTS, :56-68 → semi join);
    *  - `asOf` replaces CURRENT_TIMESTAMP (:44,57) so runs are reproducible.
    *
    * Input schemas: incoming `(product_id, name, price)`; history
    * `(product_id, name, price, valid_from, valid_to, is_current)`.
    * Returns the complete new history table (union of untouched rows,
    * closed-out rows, and new open rows) — write with mode("overwrite").
    */
  def compareAndClose(incoming: DataFrame, history: DataFrame,
                      asOf: Timestamp): DataFrame = {
    val cur = history.filter(col("is_current") === lit(true))
    val changedCur = cur.alias("s").join(
      incoming.alias("p"),
      col("s.product_id") === col("p.product_id") &&
        (col("s.name") =!= col("p.name") || col("s.price") =!= col("p.price")),
      "left_semi")

    // INSERT ... WHERE NOT EXISTS (current row with same key AND different
    // attrs) — note the reference's predicate (:48-53) skips inserting a row
    // only when a *differing* current version exists; identical rows are
    // re-inserted on re-runs. Quirk preserved.
    val inserts = incoming.alias("p").join(
      changedCur.alias("s"),
      col("p.product_id") === col("s.product_id"),
      "left_anti")
      .select(
        col("product_id"), col("name"), col("price"),
        lit(asOf).as("valid_from"),
        lit(VariantSentinel).as("valid_to"),
        lit(true).as("is_current"))

    // UPDATE ... close out versions that are current, open, keyed in the
    // batch, and different from some batch row (:56-68).
    val toClose = changedCur
      .filter(col("valid_to") === lit(VariantSentinel))
      .withColumn("valid_to", lit(asOf))
      .withColumn("is_current", lit(false))
    val untouched = history.alias("h").join(
      toClose.select("product_id", "name", "price", "valid_from").alias("c"),
      col("h.product_id") === col("c.product_id") &&
        col("h.valid_from") === col("c.valid_from") &&
        col("h.is_current") === lit(true),
      "left_anti")

    untouched.unionByName(toClose).unionByName(inserts)
  }

  /** Naive init variant (/root/reference/duckdb/scd2_example.sql:17-24):
    * every incoming row becomes an open version as-of its own event time.
    */
  def naiveInit(products: DataFrame): DataFrame =
    products.select(
      col("id"), col("name"), col("price"),
      col("ts_ms").as("effective_from"),
      lit(null).cast("timestamp").as("effective_to"),
      lit(true).as("is_current"))
}
