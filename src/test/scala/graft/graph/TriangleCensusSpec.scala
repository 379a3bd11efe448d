package graft.graph

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-validates the degree-oriented triangle count against the naive
  * triple join on graphs with known or independently-computed censuses —
  * the orientation logic (same total order for wedge pairs and closing
  * edges) is exactly the kind of thing that silently over- or
  * under-counts.
  */
class TriangleCensusSpec extends SparkSuite {

  private def edgesOf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .distinct.toDF("a", "b")
  }

  private def censusRow(edges: DataFrame): (Long, Long, Long) = {
    val r = TriangleCensus.census(edges).head()
    (r.getAs[Long]("n_edges"), r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"))
  }

  test("complete graph K8: C(8,2) edges, 8*C(7,2) wedges, C(8,3) triangles") {
    val k8 = for (i <- 0L until 8L; j <- (i + 1) until 8L) yield (i, j)
    val (e, w, t) = censusRow(edgesOf(k8))
    assert(e == 28 && w == 8 * 21 && t == 56, s"got ($e, $w, $t)")
  }

  test("cycle graph C10: 10 edges, 10 wedges, 0 triangles") {
    val ring = (0L until 10L).map(i => (i, (i + 1) % 10))
    val (e, w, t) = censusRow(edgesOf(ring))
    assert(e == 10 && w == 10 && t == 0, s"got ($e, $w, $t)")
  }

  test("star K1,9: hot hub has no triangles and all the wedges") {
    // the skew case degree orientation exists for: the hub's raw degree
    // is 9 but its out-degree after orientation is 0 or minimal
    val star = (1L to 9L).map(i => (0L, i))
    val (e, w, t) = censusRow(edgesOf(star))
    assert(e == 9 && w == 36 && t == 0, s"got ($e, $w, $t)")
  }

  test("oriented count equals the naive triple join on a hashed pseudo-random graph") {
    // deterministic ~200-node graph with mixed degrees and many ties
    val pairs = for {
      i <- 0L until 200L
      k <- 1L to 7L
      j = (i * 31 + k * k * 13) % 200 if j != i
    } yield (i, j)
    val edges = edgesOf(pairs)
    val (_, _, oriented) = censusRow(edges)
    val naive = TriangleCensus.countNaive(edges)
    assert(oriented == naive && naive > 0,
      s"oriented=$oriented naive=$naive (must match and be non-trivial)")
  }

  test("triangles() on K8 enumerates each canonical triple exactly once " +
      "and every edge carries support n-2") {
    val k8 = for (i <- 0L until 8L; j <- (i + 1) until 8L) yield (i, j)
    val tri = TriangleCensus.triangles(edgesOf(k8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri.length == 56, s"K8 has C(8,3)=56 triangles, got ${tri.length}")
    assert(tri.distinct.length == 56, "each triangle must appear exactly once")
    assert(tri.forall { case (x, y, z) => x < y && y < z },
      "triples must be id-canonical (x < y < z)")
    // per-edge support in K_n is n-2: every edge closes with each other node
    val support = tri.flatMap { case (x, y, z) => Seq((x, y), (y, z), (x, z)) }
      .groupBy(identity).map(_._2.length).toSeq
    assert(support.length == 28 && support.forall(_ == 6),
      s"K8 edge support must be 6 everywhere, got ${support.distinct}")
  }

  test("graph_ktruss_support histogram accounts for every sparsified edge " +
      "and sums to 3x the census triangle count") {
    import graft.{QueryDef, SparkEntry}
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val items = QueryDef.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(items.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b") && col("a") % 16 === col("b") % 16)
      .select("a", "b").distinct()
    val c = TriangleCensus.census(edges).head()
    val hist = SparkEntry.queries("graph_ktruss_support")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(hist.map(_._2).sum == c.getAs[Long]("n_edges"),
      "histogram must cover every edge exactly once")
    assert(hist.map { case (s, n, _) => s * n }.sum ==
      3L * c.getAs[Long]("n_triangles"),
      "total support must be 3x the triangle count (each triangle has 3 edges)")
    assert(hist.forall { case (s, _, in4) => in4 == (s >= 2) },
      "4-truss membership is support >= k-2 = 2")
  }
}
