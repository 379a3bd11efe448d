package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Cumulative shuffle-WRITE byte ledger for the bench harness (r10 verdict
  * task #3): BENCH_r*.json reports bytes-exchanged next to seconds so a
  * driver-environment slowdown can be attributed — if driver seconds track
  * shuffle bytes across queries, the fix is shrinking exchange volume, not
  * chasing the box.
  *
  * Shuffle WRITE is the right single number: every exchange writes its
  * payload exactly once (reads re-fetch the same bytes), so the ledger is
  * the total volume pushed through `Exchange` nodes — the quantity the
  * 100 TB design rules minimize. Accumulated from completed-stage task
  * metrics; [[snapshot]] drains the async listener bus first so per-query
  * deltas land on the right query.
  */
final class ShuffleMeter extends SparkListener {
  private val bytes = new AtomicLong()

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val m = e.stageInfo.taskMetrics
    if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
  }

  /** Current cumulative shuffle-write bytes, after a listener-bus drain. */
  def snapshot(sc: SparkContext): Long = {
    org.apache.spark.GraftSparkInternals.drainListenerBus(sc)
    bytes.get()
  }
}
