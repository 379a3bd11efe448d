package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.functions._

/** Brute-force reference checks for the greedy/selection operators added
  * in round 8: each query factors an inherently sequential algorithm
  * (MMR's greedy argmax, Borůvka's nomination round, the windowed funnel
  * chain) into declarative rounds — these tests replay the textbook
  * sequential algorithm in plain Scala on sf0.001 and require identical
  * output, so the factorization (not just the oracle parity) is pinned.
  */
class SelectionSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("MMR rounds replay the sequential greedy selection exactly") {
    val rows = graft.SparkEntry.queries("mmr_diversity_rerank")(spark, sf)
      .orderBy("q_id", "rank").collect()
    assert(rows.nonEmpty)
    // rebuild pools + pairwise sims from the embeddings, brute-force
    val emb = graft.QueryDef.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def sim(a: Long, b: Long): Long = {
      val (va, vb) = (emb(a), emb(b))
      math.round(dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))) * 1e12)
    }
    val qs = emb.keys.filter(_ < 20).toSeq.sorted
    val cs = emb.keys.filter(_ >= 50).toSeq.sorted
    val got = rows.groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    }
    qs.foreach { q =>
      val pool = cs.map(c => c -> sim(q, c)).sortBy { case (c, sq) => (-sq, c) }.take(10)
      var selected = Vector.empty[Long]
      (1 to 5).foreach { _ =>
        val remaining = pool.filterNot { case (c, _) => selected.contains(c) }
        val next = remaining.map { case (c, sq) =>
          val ms = if (selected.isEmpty) 0L else selected.map(s => sim(c, s)).max
          (c, 0.7 * sq.toDouble - 0.3 * ms.toDouble)
        }.minBy { case (c, score) => (-score, c) }._1
        selected :+= next
      }
      assert(got(q) == selected,
        s"q=$q: query ${got(q)} != sequential greedy $selected")
    }
  }

  test("Boruvka nominations match per-node heaviest-edge selection") {
    val out = graft.SparkEntry.queries("boruvka_msf_round")(spark, sf).collect()
    assert(out.nonEmpty)
    val ew = graft.QueryDef.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { grp =>
        val parts = grp.map(_._2).toSeq
        for (x <- parts; y <- parts if x < y) yield (x, y)
      }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSeq
    val incident = ew.flatMap { case (a, b, w) => Seq((a, (a, b, w)), (b, (a, b, w))) }
    val nominated = incident.groupBy(_._1).values.map { inc =>
      inc.map(_._2).minBy { case (a, b, w) => (-w, a, b) }
    }.toSet
    val gotEdges = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotEdges == nominated,
      s"selected forest differs: got ${gotEdges.size}, brute ${nominated.size}")
    val nNodes = incident.map(_._1).toSet.size.toLong
    assert(out.head.getAs[Long]("n_components_after") == nNodes - nominated.size)
  }

  test("windowed funnel depths match a per-user sequential scan") {
    val out = graft.SparkEntry.queries("window_funnel_depth")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = graft.QueryDef.t(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val week = 7L * 24 * 3600 * 1000000L
    val brute = ev.groupBy(_._1).values.flatMap { rows =>
      val signups = rows.filter(_._2 == "signup")
      if (signups.isEmpty) None
      else {
        val depth = signups.map { case (_, _, sUs, _) =>
          val views = rows.filter { case (_, t, vUs, _) =>
            t == "view" && vUs > sUs && vUs <= sUs + week
          }
          if (views.isEmpty) 1L
          else {
            val vUs = views.map(v => (v._3, v._4)).min._1
            val hasP = rows.exists { case (_, t, pUs, _) =>
              t == "purchase" && pUs > vUs && pUs <= sUs + week
            }
            if (hasP) 3L else 2L
          }
        }.max
        Some(depth)
      }
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out == brute, s"funnel histogram $out != brute $brute")
  }
}
