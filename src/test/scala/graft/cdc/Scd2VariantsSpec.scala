package graft.cdc

import java.sql.Timestamp

import graft.SparkSuite

import org.apache.spark.sql.functions._

class Scd2VariantsSpec extends SparkSuite {
  import spark.implicits._

  private val sent = Scd2Variants.VariantSentinel

  test("antiJoinAppend keeps only strictly-newer rows (scd2.sql:7-12)") {
    val hist = Seq(
      (1, "a", 1.0, Timestamp.valueOf("2025-01-01 00:00:00")),
      (2, "b", 2.0, Timestamp.valueOf("2025-01-02 00:00:00")))
      .toDF("id", "name", "price", "updated_at")
    val incoming = Seq(
      (1, "a2", 1.5, Timestamp.valueOf("2025-01-03 00:00:00")), // newer → kept
      (2, "b", 2.0, Timestamp.valueOf("2025-01-01 00:00:00")),  // older → dropped
      (3, "c", 3.0, Timestamp.valueOf("2025-01-01 00:00:00")))  // new key → kept
      .toDF("id", "name", "price", "updated_at")
    val out = Scd2Variants.antiJoinAppend(incoming, hist)
    assert(out.select("id").as[Int].collect().sorted.toSeq == Seq(1, 3))
  }

  test("compareAndClose preserves the reference's exact (quirky) semantics") {
    val asOf = Timestamp.valueOf("2025-06-01 00:00:00")
    val hist = Seq(
      ("p1", "widget", 9.99, Timestamp.valueOf("2025-01-01 00:00:00"), sent, true),
      ("p2", "gadget", 5.0, Timestamp.valueOf("2025-01-01 00:00:00"), sent, true))
      .toDF("product_id", "name", "price", "valid_from", "valid_to", "is_current")
    val incoming = Seq(
      ("p1", "widget", 11.99), // changed
      ("p2", "gadget", 5.0),   // identical
      ("p3", "new", 1.0))      // brand new key
      .toDF("product_id", "name", "price")

    val out = Scd2Variants.compareAndClose(incoming, hist, asOf).cache()

    // Reference quirk #1 (init_duckdb.sh:39-53): a CHANGED row is NOT
    // re-inserted — the INSERT's NOT EXISTS blocks any key that has a
    // differing current version (the comment in the script claims
    // otherwise; the SQL wins). Only the close-out happens.
    val p1 = out.filter($"product_id" === "p1").collect()
    assert(p1.length == 1)
    assert(p1(0).getAs[Timestamp]("valid_to") == asOf && !p1(0).getAs[Boolean]("is_current"))

    // Reference quirk #2 (init_duckdb.sh:48-53): an IDENTICAL row IS
    // re-inserted (the predicate only blocks differing rows) and the old
    // version stays open — two current rows after the run.
    val p2 = out.filter($"product_id" === "p2").collect()
    assert(p2.length == 2 && p2.forall(_.getAs[Boolean]("is_current")))

    // New keys insert an open version.
    val p3 = out.filter($"product_id" === "p3").collect()
    assert(p3.length == 1 && p3(0).getAs[Boolean]("is_current") &&
           p3(0).getAs[Timestamp]("valid_from") == asOf)
  }

  test("naiveInit opens a version per row (scd2_example.sql:17-24)") {
    val products = Seq((1, "a", 1.0, 1733333333000L), (2, "b", 2.0, 1733333334000L))
      .toDF("id", "name", "price", "ts_ms")
    val out = Scd2Variants.naiveInit(products)
    assert(out.count() == 2)
    assert(out.filter($"is_current" && $"effective_to".isNull).count() == 2)
  }
}
