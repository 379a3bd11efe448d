package graft

import graft.cdc.{CdcSchemas, EnvelopeReader, Scd2}

import org.apache.spark.sql.functions._

/** SCD2 throughput stress: synthesizes an N-million-event Debezium NDJSON
  * lake (via spark.range — no driver-side generation), runs the full
  * envelope→SCD2 pipeline, and prints events/second. This is the
  * "matches-or-beats the reference's single-node throughput" measurement:
  * the reference pipeline captures ~2 changes/s end-to-end
  * (generator/data-generator.py:39 sleeps 0.5s per record).
  *
  *   sbt 'runMain graft.Throughput [millions]'
  */
object Throughput {

  /** Debezium-shaped NDJSON envelope for synthetic event `id` (lsn = id,
    * ~n/keys versions per key) — shared with [[StreamingThroughput]] so the
    * batch and streaming measurements ingest the identical event stream.
    */
  private[graft] def envelopeValue(keys: Long): org.apache.spark.sql.Column =
    to_json(struct(struct(
      lit(null).cast(CdcSchemas.productsRow).as("before"),
      struct((col("id") % keys).cast("int").as("id"),
        concat(lit("name-"), col("id") % 1000).as("name"),
        lit("desc").as("description"),
        (col("id") % 10000).cast("double").as("price")).as("after"),
      when(col("id") < keys, "c").otherwise("u").as("op"),
      (lit(1733333333000L) + col("id")).as("ts_ms"),
      struct(col("id").as("lsn")).as("source")).as("payload")))

  def main(args: Array[String]): Unit = {
    val millions = args.headOption.map(_.toInt).getOrElse(1)
    val n = millions * 1000000L
    val keys = n / 10 // ~10 versions per key
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = "/tmp/graft_throughput_lake"
    val t0 = System.nanoTime()
    spark.range(n).select(envelopeValue(keys).as("value"))
      .write.mode("overwrite").text(dir)
    val tWrite = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val env = EnvelopeReader.readEnvelopes(spark, dir + "/part-*", CdcSchemas.productsRow)
    val hist = Scd2.transform(env, Seq("name", "description", "price"))
    // Materialize.force: a derived count would prune the SCD2 window
    // columns (see Materialize's scaladoc) and overstate the throughput
    val rows = Materialize.force(hist)
    val tScd2 = (System.nanoTime() - t1) / 1e9

    println(f"""{"metric":"scd2_throughput","events":$n,"history_rows":$rows,"write_s":$tWrite%.2f,"scd2_s":$tScd2%.2f,"events_per_s":${n / tScd2}%.0f}""")
    spark.stop()
  }
}
