package graft

import graft.StreamingThroughput.{BatchStat, LegResult}

/** The streaming-throughput bar (VERDICT r15 task #1): the bar's two rules
  * (rows/s floor, converged-state == expected) on crafted results, plus one
  * REAL tiny scd2 leg run to pin the progress harvesting — per-batch rows,
  * trigger-execution times, and state-row counts must come from the actual
  * StreamingQueryProgress history, and the converged ValueState row count
  * must equal the stream's distinct key count exactly.
  */
class StreamingThroughputSpec extends SparkSuite {

  private def leg(name: String, rowsPerBatch: Long, execMs: Long,
                  stateFinal: Long, expected: Long): LegResult =
    LegResult(name, rowsPerBatch * 4, wallS = 4 * execMs / 1000.0, expected,
      (0 until 4).map(i => BatchStat(i, rowsPerBatch, execMs, stateFinal)))

  test("belowFloor flags a leg under its rows/s floor") {
    // 100 rows/batch over 1 s batches = 100 rows/s, floor is 15000
    val slow = leg("scd2_incremental", 100, 1000, 10, 10)
    assert(StreamingThroughput.belowFloor(Seq(slow)) === Seq("scd2_incremental"))
    // 100k rows/batch over 1 s batches = 100k rows/s clears the floor
    val fast = leg("scd2_incremental", 100000, 1000, 10, 10)
    assert(StreamingThroughput.belowFloor(Seq(fast)) === Nil)
  }

  test("belowFloor flags a state leak (final != expected) as <leg>_state") {
    val leak = leg("lsh_dedup_ingest", 100000, 1000, stateFinal = 11, expected = 10)
    assert(StreamingThroughput.belowFloor(Seq(leak)) === Seq("lsh_dedup_ingest_state"))
    val drop = leg("lsh_dedup_ingest", 100000, 1000, stateFinal = 9, expected = 10)
    assert(StreamingThroughput.belowFloor(Seq(drop)) === Seq("lsh_dedup_ingest_state"))
  }

  test("p50/p95 come from data batches only and rows_per_s excludes idle batches") {
    val r = LegResult("scd2_incremental", 300, 10.0, 3,
      Seq(BatchStat(0, 100, 100, 1), BatchStat(1, 100, 200, 2),
        BatchStat(2, 100, 300, 3), BatchStat(3, 0, 5000, 3))) // trailing idle batch
    assert(r.p50Ms === 200L)
    assert(r.p95Ms === 300L)
    assert(math.abs(r.rowsPerS - 300 / 0.6) < 1e-9)
    assert(r.stateRowsFinal === 3L) // last DATA batch, not the idle tail
  }

  test("benchJson carries the bar and parses as JSON") {
    val legs = Seq(leg("scd2_incremental", 100, 1000, 10, 10),
      leg("lsh_dedup_ingest", 100000, 1000, 11, 10))
    val js = StreamingThroughput.benchJson(legs)
    // both rules fire: slow scd2, leaking lsh state
    assert(js.contains(""""below_floor":["lsh_dedup_ingest_state","scd2_incremental"]"""))
    // must be valid JSON — the bench tail embeds it verbatim
    val parsed = spark.read.json(
      spark.createDataset(Seq(js))(org.apache.spark.sql.Encoders.STRING))
    assert(parsed.columns.contains("below_floor"))
  }

  test("a real tiny kill-and-resume recovery leg converges exactly") {
    val r = StreamingThroughput.recoveryLeg(spark,
      SparkSuite.scratchDir("graft-streamrec"), n = 2000, slices = 4,
      stopAfter = 2)
    // the restart must drain the lake: all 4 slices committed across the
    // two query incarnations, with end-state exactness — every (id, lsn)
    // version exactly once after the sink-side dedup, state == keys
    assert(r.preStopBatches >= 1)
    assert(r.distinctVersions === 2000L)
    assert(r.stateRowsFinal === 200L)
    assert(r.clean)
    assert(StreamingThroughput.belowFloor(Nil, Some(r)) === Nil)
    // a corrupted recovery must flag through the bar
    val bad = r.copy(distinctVersions = 2001L, stateRowsFinal = 199L)
    assert(StreamingThroughput.belowFloor(Nil, Some(bad)) ===
      Seq("scd2_recovery_versions", "scd2_recovery_state"))
  }

  test("a real tiny scd2 leg harvests per-batch progress and exact state rows") {
    // 2000 events over 4 slices, 200 keys — seconds, not minutes, at local[4]
    val r = StreamingThroughput.scd2Leg(spark,
      SparkSuite.scratchDir("graft-streamtp"), n = 2000, slices = 4)
    assert(r.dataBatches.size === 4)
    assert(r.dataBatches.map(_.rows).sum === 2000L)
    assert(r.dataBatches.forall(_.execMs > 0))
    // ValueState is one row per key: converged state == distinct ids
    assert(r.expectedStateRows === 200L)
    assert(r.stateRowsFinal === 200L)
    // state must be BOUNDED: every batch's state rows <= distinct keys
    assert(r.batches.forall(_.stateRows <= 200L))
  }
}
