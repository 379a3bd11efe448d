package graft

import org.apache.spark.sql.DataFrame

/** Benchmark materializer: execute a query's OWN physical plan to
  * completion, producing every output row and column.
  *
  * Why not `df.count()` (the harness's materializer from r1 through r14a):
  * `count()` plans a DERIVED query — `Aggregate(count(1), df)` — and
  * Catalyst optimizes that whole tree. Two rewrites silently delete the
  * work being measured for any plan whose operators preserve row counts:
  *  - COLUMN PRUNING drops every column the count doesn't need, and a
  *    Window whose outputs are all pruned is removed outright — the
  *    counted plan of `events_sessionize` is a bare
  *    `FileScan parquet ... ReadSchema: struct<>` (verified on the
  *    executed plan; the whole pure-window family was being measured as
  *    an empty-schema scan);
  *  - ELIMINATE SORTS removes a final ORDER BY under the aggregate, so
  *    top-level sort cost was never measured either.
  * Join/aggregate/generate plans were measured honestly (they change row
  * counts, so the count can't skip them) — which is why every heavy
  * family's numbers survive this discovery unchanged (r14 re-sweep:
  * byte-identical shuffles outside the window family).
  *
  * `queryExecution.toRdd` is the physical RDD of df's OWN executed plan —
  * no derived tree, no consumer-driven pruning (the plan's full output
  * schema is produced as UnsafeRows by the plan's own codegen), AQE runs
  * exactly as in production — and the RDD-level count consumes every
  * partition without collecting rows to the driver. After [[force]]
  * returns, `df.queryExecution.executedPlan` IS the final adaptive plan
  * that ran, so executed-plan audits ([[ScaleAudit]]) read the measured
  * execution, not a derived or initial one (the r13 phantom-hit lesson,
  * now without the groupBy().count() detour).
  */
object Materialize {
  /** Run df's own plan to completion; returns the output row count. */
  def force(df: DataFrame): Long = df.queryExecution.toRdd.count()
}
