package graft.streaming

import graft.SparkSuite
import graft.cdc.{CdcSchemas, EnvelopeReader, Scd2}
import graft.cdc.CdcFixtures._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch equivalence (SURVEY.md §5.2.4): incremental processing
  * of the same events must converge to the batch rebuild.
  */
class Scd2StreamingSpec extends SparkSuite {
  import spark.implicits._

  private val t0 = 1733333333000L

  private val batch1 = Seq(
    envelope("null", productRow(Some(1), "w", "v1", 1.0), "c", t0, 100),
    envelope("null", productRow(Some(2), "g", "v1", 2.0), "c", t0 + 100, 110))
  private val batch2 = Seq(
    envelope(productRow(Some(1), "w", "v1", 1.0), productRow(Some(1), "w", "v2", 1.5), "u", t0 + 1000, 200),
    envelope(productRow(Some(2), "g", "v1", 2.0), "null", "d", t0 + 2000, 300))

  test("file-stream foreachBatch touched-keys rebuild == batch rebuild") {
    val lakeDir = tempDir("streamlake")
    writeLake(lakeDir, batch1)

    val attrs = Seq("name", "description", "price")
    var history: Option[org.apache.spark.sql.DataFrame] = None
    var eventLog: Option[org.apache.spark.sql.DataFrame] = None

    val stream = Scd2Streaming.readEnvelopeStream(
      spark, lakeDir.getAbsolutePath, CdcSchemas.productsRow, maxFilesPerTrigger = 1)
    val q = stream.writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
      val be = Scd2.cdcEvents(b).filter(col("id").isNotNull).cache()
      val prior = eventLog.getOrElse(be.limit(0))
      val h = Scd2Streaming.touchedKeysRebuild(be, prior, history, attrs).cache()
      h.count()
      history = Some(h)
      eventLog = Some(prior.unionByName(be).dropDuplicates("id", "log_seq_num").cache())
      ()
    }.start()
    q.processAllAvailable()
    writeLake(lakeDir, batch2, day = 13)
    q.processAllAvailable()
    q.stop()

    val batchOut = Scd2.transform(
      EnvelopeReader.readEnvelopes(spark, lakeDir.getAbsolutePath, CdcSchemas.productsRow),
      attrs)
    val a = history.get.orderBy("id", "row_valid_start_timestamp").collect().toSeq
    val b = batchOut.orderBy("id", "row_valid_start_timestamp").collect().toSeq
    assert(a == b, "incremental touched-keys result diverged from batch rebuild")
  }

  test("flatMapGroupsWithState incremental handles out-of-order + late events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Scd2Streaming.KeyEvent]
    val out = Scd2Streaming.incremental(input.toDS())
    val q = out.writeStream.format("memory").queryName("inc_out")
      .outputMode("append").start()

    // arrive out of order: lsn 300 before 200; then late lsn 150
    input.addData(Scd2Streaming.KeyEvent(1, 100, t0, Map("name" -> "a"), "c"))
    q.processAllAvailable()
    input.addData(Scd2Streaming.KeyEvent(1, 300, t0 + 3000, Map("name" -> "c"), "u"))
    q.processAllAvailable()
    input.addData(Scd2Streaming.KeyEvent(1, 200, t0 + 2000, Map("name" -> "b"), "u"))
    q.processAllAvailable()
    // duplicate lsn must be ignored
    input.addData(Scd2Streaming.KeyEvent(1, 200, t0 + 2000, Map("name" -> "b"), "u"))
    q.processAllAvailable()
    q.stop()

    // last-write-wins per lsn: reconstruct final chain from emitted rows
    val rows = spark.table("inc_out").as[Scd2Streaming.VersionRow].collect()
    val finalChain = rows.groupBy(_.lsn).map { case (_, vs) => vs.last }
      .toSeq.sortBy(_.lsn)
    assert(finalChain.map(_.lsn) == Seq(100L, 200L, 300L))
    assert(finalChain.map(_.rowValidExpirationMs) ==
           Seq(t0 + 2000, t0 + 3000, Scd2Streaming.SentinelMs),
      "late lsn-200 event must re-close lsn-100's interval and chain into lsn-300")
    assert(finalChain.map(_.attrs("name")) == Seq("a", "b", "c"))
  }
}
