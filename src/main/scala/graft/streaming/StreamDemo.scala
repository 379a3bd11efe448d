package graft.streaming

import java.io.File

import graft.GraftSession
import graft.cdc.{CdcSchemas, Scd2}

/** Runnable end-to-end demo of the continuous SCD2 path:
  * writes a small Debezium-envelope NDJSON lake, streams it with
  * `maxFilesPerTrigger=1` (micro-batches), incrementally maintains the
  * SCD2 table via [[Scd2Streaming.touchedKeysRebuild]], and prints the
  * final history + current state.
  *
  *   sbt 'runMain graft.streaming.StreamDemo [lakeDir]'
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("WARN")

    val lakeDir = args.headOption.getOrElse {
      val d = File.createTempFile("scd2demo", "")
      d.delete(); d.mkdirs()
      val t0 = 1733333333000L
      def env(before: String, after: String, op: String, ts: Long, lsn: Long) =
        s"""{"payload": {"before": $before, "after": $after, "op": "$op", "ts_ms": $ts, "source": {"lsn": $lsn}}}"""
      def row(id: Int, name: String, desc: String, price: Double) =
        s"""{"id": $id, "name": "$name", "description": "$desc", "price": $price}"""
      val part = new File(d, "year=2025/month=08/day=12"); part.mkdirs()
      java.nio.file.Files.writeString(part.toPath.resolve("part-0000.json"),
        Seq(
          env("null", row(1, "widget", "v1", 9.99), "c", t0, 100),
          env("null", row(2, "gadget", "v1", 5.00), "c", t0 + 500, 150)).mkString("", "\n", "\n"))
      java.nio.file.Files.writeString(part.toPath.resolve("part-0001.json"),
        Seq(
          env(row(1, "widget", "v1", 9.99), row(1, "widget", "v2", 10.99), "u", t0 + 1000, 200),
          env(row(1, "widget", "v2", 10.99), "null", "d", t0 + 2000, 300)).mkString("", "\n", "\n"))
      d.getAbsolutePath
    }

    // The maintainer owns the per-batch caches: superseded history
    // generations are unpersisted and the event log is localCheckpoint'ed
    // (lineage-truncating), so a long-running demo's storage stays bounded
    // instead of growing a cache chain per trigger.
    val maintainer = new Scd2Streaming.TouchedKeysMaintainer(
      Seq("name", "description", "price"))
    val q = Scd2Streaming
      .readEnvelopeStream(spark, lakeDir, CdcSchemas.productsRow, maxFilesPerTrigger = 1)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        maintainer.step(b)
        println(s"--- micro-batch $id: history ${maintainer.history.map(_.count()).getOrElse(0L)} rows")
      }
      .start()
    q.processAllAvailable()
    q.stop()

    println("=== SCD2 history ===")
    maintainer.history.foreach(_.orderBy("id", "row_valid_start_timestamp").show(50, truncate = false))
    println("=== current state ===")
    maintainer.history.foreach(h => Scd2.currentState(h).orderBy("id").show(50, truncate = false))
    spark.stop()
  }
}
