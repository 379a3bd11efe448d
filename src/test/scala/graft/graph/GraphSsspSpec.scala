package graft.graph

import graft.{SparkEntry, SparkSuite}

import org.apache.spark.sql.functions._

/** The load-bearing invariant behind `graph_sssp_bellman_k3`'s frontier
  * optimization: restricting each Bellman-Ford round's relaxations to the
  * FRONTIER (nodes whose distance improved last round) must produce the
  * same k-round distance table as relaxing every settled node each round —
  * that is what lets the Spark side run the cheap SPFA form while the
  * DuckDB oracle replays the simple full-relaxation CTE chain. Asserted on
  * the real sf0.001 graph, not a toy fixture, so degenerate frontiers
  * (isolated seeds, multi-edge ties) are exercised.
  */
class GraphSsspSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("3-round frontier SPFA equals 3-round full Bellman-Ford relaxation") {
    import graft.QueryDef.t

    // full-relaxation reference, built independently of the catalog code:
    // dist_k(v) = min over paths of <= k edges from any seed
    val pairs = t(spark, sf, "lineitem")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_quantity")).cast("long").as("w"))
    val edges = pairs
      .select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"), col("w"))
      .unionByName(pairs.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst"), col("w")))
      .persist()
    val seedHash = conv(substring(md5(concat(lit("sssp:"),
      col("node").cast("string"))), 1, 15), 16, 10).cast("long") % 1000000L
    var full = edges.select(col("src").as("node")).distinct()
      .filter(seedHash < 20000L)
      .select(col("node"), lit(0L).as("d"))
    for (_ <- 1 to 3) {
      full = full.unionByName(
          edges.join(full.withColumnRenamed("node", "src")
              .withColumnRenamed("d", "fd"), "src")
            .select(col("dst").as("node"), (col("fd") + col("w")).as("d")))
        .groupBy("node").agg(min(col("d")).as("d"))
        .localCheckpoint(true)
    }
    val expected = full.select(col("node"), col("d").as("min_cost"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val actual = SparkEntry.queries("graph_sssp_bellman_k3")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    edges.unpersist()

    assert(actual == expected,
      s"frontier SPFA diverged from full relaxation: " +
        s"${(actual.toSet diff expected.toSet).take(5)} vs " +
        s"${(expected.toSet diff actual.toSet).take(5)}")
    // sanity: the seed set is non-trivial and some node is 3 hops out
    assert(actual.valuesIterator.contains(0L), "seeds must carry d=0")
    assert(actual.size > actual.valuesIterator.count(_ == 0L),
      "relaxation must reach beyond the seed set")
  }
}
