package graft.operators

import graft.{QueryDef, SparkSuite}

import org.apache.spark.sql.functions._

/** Sketch-tolerance contracts that are deliberately NOT in the
  * hash-matched oracle (r8 ADVICE on hll_intersection_audit): the
  * inclusion-exclusion estimate compounds three lgK=14 sketch errors, so
  * the tolerance bar sits near 3σ — a marginal pair should fail HERE,
  * with the offending pair and its error printed, not as an opaque
  * whole-query hash mismatch in the driver gate.
  */
class AnalyticsSketchSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("HLL inclusion-exclusion intersection stays within " +
      "max(5% of union, 20) of the exact overlap on every event-type pair") {
    val tu = QueryDef.t(spark, sf, "events")
      .select(col("event_type").as("et"), col("user_id")).distinct()
    val sk = tu.groupBy("et").agg(
      hll_sketch_agg(col("user_id"), 14).as("sk"),
      count(lit(1)).as("n_exact"))
    val pairs = sk
      .select(col("et").as("et_a"), col("sk").as("sk_a"), col("n_exact").as("n_a"))
      .crossJoin(broadcast(sk.select(col("et").as("et_b"), col("sk").as("sk_b"),
        col("n_exact").as("n_b"))))
      .filter(col("et_a") < col("et_b"))
    val inter = tu.select(col("et").as("et_a"), col("user_id"))
      .join(tu.select(col("et").as("et_b"), col("user_id")), "user_id")
      .filter(col("et_a") < col("et_b"))
      .groupBy("et_a", "et_b").agg(count(lit(1)).as("n_inter_exact"))
    val rows = pairs.join(inter, Seq("et_a", "et_b"), "left_outer")
      .withColumn("n_inter_exact", coalesce(col("n_inter_exact"), lit(0L)))
      .withColumn("n_union_exact", col("n_a") + col("n_b") - col("n_inter_exact"))
      .withColumn("est_inter",
        hll_sketch_estimate(col("sk_a")) + hll_sketch_estimate(col("sk_b")) -
          hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))))
      .select("et_a", "et_b", "n_inter_exact", "n_union_exact", "est_inter")
      .collect()
    assert(rows.nonEmpty)
    val bad = rows.filter { r =>
      // hll_sketch_estimate returns BIGINT, so the inclusion-exclusion
      // chain stays integral
      val err = math.abs(r.getAs[Long]("est_inter") -
        r.getAs[Long]("n_inter_exact")).toDouble
      err > math.max(0.05 * r.getAs[Long]("n_union_exact"), 20.0)
    }
    assert(bad.isEmpty,
      s"inclusion-exclusion error out of tolerance:\n${bad.mkString("\n")}")
  }

  test("7-day sliding HLL union stays within max(5% of exact, 50) of the " +
      "exact distinct count on every (event_type, win_day) window") {
    // the tolerance leg of hll_sliding_window_distinct, moved out of the
    // hash-matched oracle (r9 ADVICE): a ≤7-way lgK=14 union error is
    // ~0.8%/√7-σ per sketch, so the max(5%, 50) bar is >5σ — but a
    // distribution shift that flips one window should fail HERE with the
    // offending window printed, not as a whole-query hash mismatch.
    val ev = QueryDef.t(spark, sf, "events")
      .select(col("event_type"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("dnum"),
        col("user_id"))
    val daily = ev.groupBy("event_type", "dnum")
      .agg(hll_sketch_agg(col("user_id"), 14).as("sk"))
    val est = daily
      .select(col("event_type"), col("sk"),
        explode(expr("sequence(dnum, dnum + 6)")).as("win_day"))
      .groupBy("event_type", "win_day")
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sk"), allowDifferentLgConfigK = false)).as("est"))
    val exact = ev.select(col("event_type"), col("user_id"),
        explode(expr("sequence(dnum, dnum + 6)")).as("win_day"))
      .groupBy("event_type", "win_day")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    val rows = exact.join(est, Seq("event_type", "win_day")).collect()
    assert(rows.nonEmpty)
    val bad = rows.filter { r =>
      val err = math.abs(r.getAs[Long]("est") -
        r.getAs[Long]("n_exact")).toDouble
      err > math.max(0.05 * r.getAs[Long]("n_exact"), 50.0)
    }
    assert(bad.isEmpty,
      s"7-day union estimate out of tolerance:\n${bad.mkString("\n")}")
  }
}
