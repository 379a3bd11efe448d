package graft.cdc

import graft.SparkSuite

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5.2.3): ∀ random event sequences —
  * (a) per-key validity intervals chain start→sentinel without gaps;
  * (b) the result is invariant under input shuffling;
  * (c) current state == max-lsn event per key.
  * (Raw ScalaCheck generators with fixed seeds — the scalatest bridge
  * module isn't on the offline classpath.)
  */
class Scd2PropertySpec extends SparkSuite {

  private val eventGen: Gen[List[(Int, Long, Long, String)]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      id <- Gen.choose(1, 5)
      lsn <- Gen.choose(1L, 10000L)
      ts <- Gen.choose(1733000000000L, 1733999999000L)
      name <- Gen.alphaStr.map(_.take(8))
    } yield (id, lsn, ts, name))
  } yield evs.distinctBy(e => (e._1, e._2)) // unique (id, lsn)

  private def toEvents(evs: List[(Int, Long, Long, String)]) = {
    import spark.implicits._
    evs.toDF("id", "log_seq_num", "ts_ms", "name")
      .select(col("id"),
        struct(col("name")).as("after_row_value"),
        lit(null).cast("struct<name:string>").as("before_row_value"),
        lit("UPDATE").as("operation_type"),
        col("log_seq_num"),
        timestamp_millis(col("ts_ms")).as("source_timestamp"))
  }

  test("intervals chain per key; shuffle-invariant; current == max-lsn event") {
    for (seed <- 1 to 12) {
      val evs = eventGen(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(Nil)
      if (evs.nonEmpty) {
        def collectRows(input: List[(Int, Long, Long, String)]) =
          Scd2.history(Scd2.rankedEvents(toEvents(input)), Seq("name"))
            .collect()
            .map(r => (r.getInt(0), r.getString(1),
              r.getAs[java.sql.Timestamp]("row_valid_start_timestamp").getTime,
              r.getAs[java.sql.Timestamp]("row_valid_expiration_timestamp").getTime))
            .sortBy(t => (t._1, t._3, t._4, t._2)).toSeq

        // expected chain: per key, events in LSN order; interval =
        // [ts_i, ts_{i+1}) with the last closed by the sentinel. NOTE the
        // chain is LSN-ordered — ts is independent of lsn, so intervals may
        // be "backwards" in wall-clock; the reference has the same property.
        val sentinelMs = Scd2.DefaultSentinel.getTime
        val expected = evs.groupBy(_._1).toSeq.flatMap { case (id, es) =>
          val ordered = es.sortBy(_._2)
          ordered.zipWithIndex.map { case ((_, _, ts, name), i) =>
            val end = if (i + 1 < ordered.length) ordered(i + 1)._3 else sentinelMs
            (id, name, ts, end)
          }
        }.sortBy(t => (t._1, t._3, t._4, t._2))

        assert(collectRows(evs) == expected, s"seed=$seed: history != expected chain")
        assert(collectRows(scala.util.Random.shuffle(evs)) == expected,
          s"seed=$seed: not shuffle-invariant")

        val currents = Scd2.currentState(
          Scd2.history(Scd2.rankedEvents(toEvents(evs)), Seq("name")))
          .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
        val expectedCur = evs.groupBy(_._1).map { case (id, es) => id -> es.maxBy(_._2)._4 }
        assert(currents == expectedCur, s"seed=$seed: current-state mismatch")
      }
    }
  }
}
