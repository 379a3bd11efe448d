package graft.operators

import org.apache.spark.sql.functions._

/** Dev-only adjudication probe (VERDICT r15 task #6): run the k-core peel
  * loop to FIXPOINT over the co-purchase graph and print the round count
  * per lake. kcore_peel_round's catalog contract is one round; its smoke
  * cost at a larger factor is rounds × per-round cost, so the question a
  * high driver-smoke ratio raises is whether a bigger lake adds peel
  * ROUNDS (it should not — the degree DISTRIBUTION, not the row count,
  * drives how many peels reach the fixpoint; the 10× lake is 10 shifted
  * copies of the same distribution). The loop is the production shape the
  * catalog query's scaladoc promises: shrinking survivor set
  * localCheckpoint'd per round (truncated lineage, released blocks), two
  * map-side-combined degree aggregates plus two semi joins per round.
  *
  *   runMain graft.operators.KcoreRounds <dir> [k]
  */
object KcoreRounds {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 4
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    var edges = AnalyticsQueries.copurchaseEdges(spark, dir).localCheckpoint(true)
    var nEdges = edges.count()
    var round = 0
    var done = false
    while (!done) {
      val deg = edges.select(col("a").as("node"))
        .unionByName(edges.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val kept = deg.filter(col("deg") >= k)
      val next = edges
        .join(kept.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(kept.select(col("node").as("b")), Seq("b"), "left_semi")
        .localCheckpoint(true)
      val nNext = next.count()
      round += 1
      println(f"[kcore] round $round%2d: edges $nEdges%10d -> $nNext%10d")
      done = nNext == nEdges // fixpoint: no edge lost a qualifying endpoint
      edges.unpersist(blocking = false)
      edges = next
      nEdges = nNext
    }
    val survivors = edges.select(col("a").as("node"))
      .unionByName(edges.select(col("b").as("node"))).distinct().count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"kcore_rounds","dir":"$dir","k":$k,"rounds":$round,"core_edges":$nEdges,"core_nodes":$survivors,"wall_s":${f"$wall%.1f"}}""")
    spark.stop()
  }
}
