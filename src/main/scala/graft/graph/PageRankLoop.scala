package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The PageRank power-iteration loop body, factored out of the
  * `pagerank_power_k5` QueryDef so its per-round physical plan can be
  * pinned in CI (r10 verdict task #4): the query function eagerly
  * localCheckpoints every round, so by the time a test sees its plan only
  * the final RDD scan remains — the pin has to build ONE un-checkpointed
  * round from the same code the query runs.
  *
  * Scale contract per round (asserted by `PlanSpec`): the edge table is
  * PERSISTED hash-partitioned on `src` and sorted within partitions, so
  * the round's merge join consumes it with ZERO exchange and ZERO sort —
  * only the node-proportional rank vector is exchanged (once into the
  * join, once for the destination aggregate). Reference behavior
  * (iterative rollup cadence): shalini-p16/change-data-capture-poc
  * duckdb/analytics/transform_scd2.py:19-61 re-derives state per batch;
  * the power iteration is the graph-analytics extension of that replay
  * discipline.
  */
object PageRankLoop {

  /** Total fixed-point mass: Σ ranks = 1e12 (×85 stays ≪ 2^63). */
  val TotalMass = 1000000000000L

  /** (src, dst, outdeg) persisted with an explicit hash(src) repartition
    * plus in-partition sort: cached plans keep their declared
    * partitioning and ordering, so every round's merge join reads the
    * edge side with no exchange and no sort. A localCheckpoint here
    * measurably re-exchanged the edges every round (the AQE shuffle read
    * behind the pin reports unknown partitioning, so EnsureRequirements
    * re-added the big-side shuffle ×5).
    */
  def persistedGraph(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    edges.join(deg, "src").repartition(col("src"))
      .sortWithinPartitions("src").persist()
  }

  /** Uniform start vector: every node gets TotalMass div N. */
  def initRanks(graph: DataFrame, nB: DataFrame): DataFrame =
    graph.select(col("src").as("node")).distinct()
      .crossJoin(broadcast(nB))
      .select(col("node"), expr(s"$TotalMass div n_nodes").as("r"))

  /** One un-checkpointed power-iteration round:
    * r' = (15·(TotalMass div N)) div 100 + (85·Σ_{in} r div outdeg) div 100.
    * The merge hint pins SMJ — the edge side GROWS with the corpus, so
    * letting AQE hash-build/broadcast it is the copurchase scale cliff;
    * SMJ rides the cached sort order for free.
    */
  def nextRanks(graph: DataFrame, ranks: DataFrame, nB: DataFrame): DataFrame =
    graph.hint("merge")
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), expr("r div outdeg").as("c"))
      .groupBy("node").agg(sum(col("c")).as("inmass"))
      .crossJoin(broadcast(nB))
      .select(col("node"),
        expr(s"(15 * ($TotalMass div n_nodes)) div 100 " +
          "+ (85 * inmass) div 100").as("r"))
}
