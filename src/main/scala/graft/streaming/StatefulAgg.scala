package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The Spark 4 arbitrary-state v2 surface (`transformWithState` +
  * typed `ValueState`, RocksDB-backed): a running per-key aggregate
  * maintained across micro-batches. This is the successor API to
  * `mapGroupsWithState`/`flatMapGroupsWithState` (which
  * [[Scd2Streaming.incremental]] exercises) — state is declared through a
  * handle with explicit encoders and optional TTL, timers are first-class,
  * and the store layout supports multiple named states per key.
  *
  * The aggregate kept here is (event count, exact integer-cents sum):
  * integer state makes the converged result bit-comparable to a batch
  * GROUP BY under the DuckDB oracle — the same exactness discipline as
  * every decimal-cast sum in the catalog. State is O(keys); emission is
  * one row per key per batch that saw input (update semantics), so the
  * LAST emission per key is the converged aggregate.
  */
object StatefulAgg {

  /** (user_id, n_events, sum of value in exact hundredths). */
  case class UserAgg(user_id: Long, n_events: Long, sum_cents: Long)

  final class RunningAgg extends StatefulProcessor[Long, (Long, Long), UserAgg] {
    @transient private var st: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)](
        "agg", Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 timerValues: TimerValues): Iterator[UserAgg] = {
      var (n, sum) = if (st.exists()) st.get() else (0L, 0L)
      rows.foreach { case (_, cents) => n += 1; sum += cents }
      st.update((n, sum))
      Iterator.single(UserAgg(key, n, sum))
    }
  }
}
