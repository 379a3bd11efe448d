package graft.cdc

import java.sql.Timestamp

import graft.SparkSuite
import graft.cdc.CdcFixtures._

import org.apache.spark.sql.functions._

/** Scenario coverage from FIXTURES.md §1 against the reference semantics of
  * transform_scd2.py (file:line cites in Scd2.scala).
  */
class Scd2Spec extends SparkSuite {

  private val t0 = 1733333333000L // aligned to whole seconds

  /** insert p1 → update p1 → delete p1; insert p2; snapshot p3; plus junk. */
  private def standardLines: Seq[String] = Seq(
    envelope("null", productRow(Some(1), "widget", "v1", 9.99), "c", t0, 100),
    envelope(productRow(Some(1), "widget", "v1", 9.99),
             productRow(Some(1), "widget", "v2", 10.99), "u", t0 + 1000, 200),
    envelope(productRow(Some(1), "widget", "v2", 10.99), "null", "d", t0 + 2000, 300),
    envelope("null", productRow(Some(2), "gadget", "fresh", 5.0), "c", t0 + 500, 150),
    envelope("null", productRow(Some(3), "legacy", "snap", 1.0), "r", t0, 50),
    envelope("null", productRow(Some(4), "noop", null, 2.0), null, t0, 400), // missing op → dropped
    envelope("null", "null", "c", t0, 500) // both ids null → dropped
  )

  private def lake(lines: Seq[String], gzip: Boolean = false): String = {
    val d = tempDir("scd2lake")
    writeLake(d, lines, gzip = gzip)
    d.getAbsolutePath
  }

  test("full SCD2 pipeline: versions, sentinel, delete quirk, filters") {
    val env = EnvelopeReader.readEnvelopes(spark, lake(standardLines), CdcSchemas.productsRow)
    val out = Scd2.transform(env, Seq("name", "description", "price")).cache()
    val rows = out.orderBy("id", "row_valid_start_timestamp").collect()

    // ids 1 (3 versions), 2, 3; id-4 (missing op) and null-id row dropped
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 1, 1, 2, 3))

    val p1 = rows.filter(_.getInt(0) == 1)
    assert(p1.map(_.getString(1)).toSeq == Seq("widget", "widget", null),
      "delete event keeps a version with NULL attributes (transform_scd2.py:53-56 quirk)")
    assert(p1.map(r => Option(r.get(3))).toSeq == Seq(Some(9.99), Some(10.99), None))

    // interval chaining: start of v2 == end of v1; open interval = sentinel
    assert(p1(0).getAs[Timestamp]("row_valid_expiration_timestamp") ==
           p1(1).getAs[Timestamp]("row_valid_start_timestamp"))
    assert(p1(2).getAs[Timestamp]("row_valid_expiration_timestamp") == Scd2.DefaultSentinel)

    // snapshot op 'r' behaves as create
    assert(rows.filter(_.getInt(0) == 3).head.getString(1) == "legacy")
  }

  test("ordering is by lsn, not arrival order (shuffled input)") {
    val shuffled = scala.util.Random.shuffle(standardLines)
    val env = EnvelopeReader.readEnvelopes(spark, lake(shuffled), CdcSchemas.productsRow)
    val out = Scd2.transform(env, Seq("name", "description", "price"))
    val p1 = out.filter(col("id") === 1)
      .orderBy("row_valid_start_timestamp").collect()
    assert(p1.map(r => Option(r.get(3))).toSeq == Seq(Some(9.99), Some(10.99), None))
  }

  test("gzip lake + operationType mapping incl INVALID") {
    val env = EnvelopeReader.readEnvelopes(spark, lake(standardLines, gzip = true),
      CdcSchemas.productsRow)
    assert(Scd2.cdcEvents(env).count() == 6) // junk op=null dropped, null-id retained here

    val ops = Scd2.cdcEvents(env).select("operation_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(ops == Set("CREATE", "UPDATE", "DELETE", "SNAPSHOT"))
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row("x"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType))))
    assert(bad.select(Scd2.operationType(col("op"))).head().getString(0) == "INVALID")
  }

  test("users table instantiation") {
    val lines = Seq(
      envelope("null", userRow(Some(7), "alice", "pw1"), "c", t0, 10),
      envelope(userRow(Some(7), "alice", "pw1"), userRow(Some(7), "alice", "pw2"), "u", t0 + 9000, 20))
    val env = EnvelopeReader.readEnvelopes(spark, lake(lines), CdcSchemas.usersRow)
    val out = Scd2.transform(env, Seq("username", "password"))
    assert(out.count() == 2)
    assert(Scd2.currentState(out).select("password").head().getString(0) == "pw2")
  }

  test("duplicate (id, lsn) events are idempotent after dedupeEvents") {
    val dup = standardLines ++ Seq(
      envelope("null", productRow(Some(1), "widget", "v1", 9.99), "c", t0, 100))
    val env = EnvelopeReader.readEnvelopes(spark, lake(dup), CdcSchemas.productsRow)
    val deduped = Scd2.history(
      Scd2.rankedEvents(Scd2.dedupeEvents(Scd2.cdcEvents(env))),
      Seq("name", "description", "price"))
    val clean = Scd2.transform(
      EnvelopeReader.readEnvelopes(spark, lake(standardLines), CdcSchemas.productsRow),
      Seq("name", "description", "price"))
    assert(deduped.count() == clean.count())
  }

  test("malformed JSON line becomes null row and is filtered") {
    val d = tempDir("badlake")
    writeLake(d, standardLines :+ "{not json at all")
    val env = EnvelopeReader.readEnvelopes(spark, d.getAbsolutePath, CdcSchemas.productsRow)
    assert(Scd2.transform(env, Seq("name", "description", "price")).count() == 5)
  }

  test("ms-precision timestamps survive (division semantics, SURVEY §7.4)") {
    val lines = Seq(envelope("null", productRow(Some(9), "ms", null, 1.0), "c", t0 + 123, 900))
    val env = EnvelopeReader.readEnvelopes(spark, lake(lines), CdcSchemas.productsRow)
    val ts = Scd2.transform(env, Seq("name"))
      .select("row_valid_start_timestamp").head().getTimestamp(0)
    assert(ts.getTime == t0 + 123)
  }

  test("Kafka value parse == file envelope parse (no broker needed)") {
    import spark.implicits._
    val kafkaShaped = standardLines.toDF("v")
      .select(col("v").cast("binary").as("value"))
    val parsed = graft.streaming.Scd2Streaming.parseKafkaValue(
      kafkaShaped, CdcSchemas.productsRow)
    val out = Scd2.transform(parsed, Seq("name", "description", "price"))
    val fileOut = Scd2.transform(
      EnvelopeReader.readEnvelopes(spark, lake(standardLines), CdcSchemas.productsRow),
      Seq("name", "description", "price"))
    assert(out.orderBy("id", "row_valid_start_timestamp").collect().toSeq ==
           fileOut.orderBy("id", "row_valid_start_timestamp").collect().toSeq)
  }

  test("currentStateLive drops deleted keys, keeps live ones") {
    val env = EnvelopeReader.readEnvelopes(spark, lake(standardLines), CdcSchemas.productsRow)
    val hist = Scd2.transform(env, Seq("name", "description", "price"))
    val live = Scd2.currentStateLive(hist, Seq("name", "description", "price"))
    // id 1 was deleted (NULL-attr open version) → excluded; 2 and 3 live
    assert(live.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
  }

  test("current-state view and latestByKey agree") {
    val env = EnvelopeReader.readEnvelopes(spark, lake(standardLines), CdcSchemas.productsRow)
    val hist = Scd2.transform(env, Seq("name", "description", "price"))
    val cur = Scd2.currentState(hist)
    assert(cur.count() == 3) // one open version per surviving key
    val last = Scd2.latestByKey(Scd2.cdcEvents(env).filter(col("id").isNotNull), "id", "log_seq_num")
    assert(last.count() == 3)
  }
}
