package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Algebraic-identity checks for the statistical-inference operators: each
  * query computes its statistic through a distribution-friendly
  * factorization (histogram rank sums, minimax PAV, pair joins over
  * aggregates), and these tests pin each factorization against the
  * textbook sequential/brute-force definition on real sf0.001 data — the
  * cross-engine oracle proves Spark==DuckDB, these prove both equal the
  * MATH.
  */
class StatSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("isotonic minimax fit equals sequential pool-adjacent-violators") {
    val rows = graft.SparkEntry.queries("isotonic_calibration_pav")(spark, sf)
      .orderBy("bin")
      .select("bin", "n_users", "n_conv", "iso_rate")
      .collect()
    assert(rows.nonEmpty)
    // classic PAV: sweep left to right, pooling while the previous
    // block's mean exceeds the current one's (exact integer
    // cross-multiplication — no FP in the pooling decision)
    val bins = rows.map(r => (r.getLong(1), r.getLong(2)))
    val blocks = scala.collection.mutable.ListBuffer[(Long, Long, Int)]()
    for ((w, y) <- bins) {
      var bw = w; var by = y; var bn = 1
      while (blocks.nonEmpty &&
          blocks.last._2 * bw > by * blocks.last._1) { // prev mean > cur mean
        val (pw, py, pn) = blocks.remove(blocks.length - 1)
        bw += pw; by += py; bn += pn
      }
      blocks += ((bw, by, bn))
    }
    val pav = blocks.flatMap { case (w, y, n) =>
      Seq.fill(n)(y.toDouble / w.toDouble)
    }.toSeq
    val iso = rows.map(_.getDouble(3)).toSeq
    assert(iso.size == pav.size)
    iso.zip(pav).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) < 1e-12, s"bin index $i: minimax $a != PAV $b")
    }
    // and the fit is monotone non-decreasing
    iso.sliding(2).foreach { case Seq(a, b) => assert(a <= b + 1e-12) case _ => }
  }

  test("Kaplan-Meier output is internally consistent with the product-limit") {
    val rows = graft.SparkEntry.queries("survival_km_conversion")(spark, sf)
      .orderBy("t_days")
      .select("t_days", "n_at_risk", "n_conversions", "surv_micro")
      .collect()
    assert(rows.nonEmpty)
    var prod = 1.0
    var lastRisk = Long.MaxValue
    var lastSurv = Long.MaxValue
    rows.foreach { r =>
      val (n, d, sm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n < lastRisk || lastRisk == Long.MaxValue || n <= lastRisk,
        "risk set must shrink")
      assert(d > 0 && d < n, "steps stop before any d=n degenerate tail")
      prod *= (n - d).toDouble / n.toDouble
      val direct = math.round(prod * 1e6)
      assert(math.abs(sm - direct) <= 1L,
        s"t=${r.getLong(0)}: surv_micro $sm vs direct product $direct")
      assert(sm <= lastSurv, "survival curve must be non-increasing")
      lastRisk = n; lastSurv = sm
    }
  }

  test("Mann-Kendall S and tie-corrected variance match the brute definition") {
    val out = graft.SparkEntry.queries("mann_kendall_trend")(spark, sf).collect().head
    val daily = graft.QueryDef.t(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .orderBy("day").select("n").collect().map(_.getLong(0))
    var s = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length)
      s += java.lang.Long.signum(daily(j) - daily(i))
    val n = daily.length.toLong
    val v0 = n * (n - 1) * (2 * n + 5)
    val vt = daily.groupBy(identity).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    assert(out.getAs[Long]("n_days") == n)
    assert(out.getAs[Long]("s_stat") == s, s"S: ${out.getAs[Long]("s_stat")} vs brute $s")
    assert(out.getAs[Long]("var18") == v0 - vt)
  }

  test("Gini histogram rank-sum equals the sorted per-row formula") {
    val out = graft.SparkEntry.queries("gini_revenue_concentration")(spark, sf)
      .collect().head
    val cents = graft.QueryDef.t(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
      .select((col("rev") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val tot = cents.sum
    val rs = cents.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    val giniNano = math.round((2 * rs - (n + 1) * tot).toDouble / (n * tot).toDouble * 1e9)
    assert(out.getAs[Long]("n_customers") == n)
    assert(out.getAs[Long]("total_cents") == tot)
    assert(out.getAs[Long]("gini_nano") == giniNano,
      s"gini: ${out.getAs[Long]("gini_nano")} vs brute $giniNano")
  }

  test("permutation test is deterministic with a valid p-value") {
    val a = graft.SparkEntry.queries("permutation_test_mean_diff")(spark, sf).collect().head
    val b = graft.SparkEntry.queries("permutation_test_mean_diff")(spark, sf).collect().head
    assert(a == b, "hash-driven replicates must be run-stable")
    val p = a.getAs[Double]("p_value")
    assert(p > 0.0 && p <= 1.0)
    assert(a.getAs[Long]("b_replicates") == 64L)
  }

  test("chi-square factorization equals the brute (O-E)²/E definition") {
    val out = graft.SparkEntry.queries("chi2_lang_source")(spark, sf).collect().head
    val cells = graft.QueryDef.t(spark, sf, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val langs = cells.keys.map(_._1).toSeq.distinct
    val srcs = cells.keys.map(_._2).toSeq.distinct
    val nTot = cells.values.sum
    val rowT = langs.map(l => l -> cells.filter(_._1._1 == l).values.sum).toMap
    val colT = srcs.map(s0 => s0 -> cells.filter(_._1._2 == s0).values.sum).toMap
    // replicate the per-cell nano quantization exactly, then integer-sum
    val chi2Nano = cells.map { case ((l, s0), o) =>
      val diff = (o * nTot - rowT(l) * colT(s0)).toDouble
      math.round(diff * diff / (nTot * rowT(l) * colT(s0)).toDouble * 1e9)
    }.sum
    assert(out.getAs[Long]("chi2_nano") == chi2Nano,
      s"chi2: ${out.getAs[Long]("chi2_nano")} vs brute $chi2Nano")
    assert(out.getAs[Long]("df") == (langs.size - 1).toLong * (srcs.size - 1))
  }

  test("quantile normalization maps ranks to exact global order statistics") {
    val rows = graft.SparkEntry.queries("quantile_normalize_sources")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = graft.QueryDef.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val global = docs.map(_._3).sorted
    val ng = global.length.toLong
    val bySource = docs.groupBy(_._2)
    val expected = bySource.iterator.flatMap { case (_, ds) =>
      val sortedDs = ds.sortBy(d => (d._3, d._1))
      val b = sortedDs.length - 1L
      sortedDs.zipWithIndex.map { case (d, a) =>
        val g = if (b > 0) a.toLong * (ng - 1) / b else 0L
        d._1 -> global(g.toInt)
      }
    }.toMap
    rows.foreach { case (docId, _, _, norm) =>
      assert(norm == expected(docId),
        s"doc $docId: norm $norm != brute order statistic ${expected(docId)}")
    }
    assert(rows.length == docs.length)
  }

  test("LPA adopts only labels that exist among a node's neighbors") {
    val res = graft.SparkEntry.queries("label_propagation_round")(spark, sf)
    val edges = AnalyticsQueries.copurchaseEdges(spark, sf)
    val adj = edges.select(col("a").as("node"), col("b").as("nbr"))
      .unionAll(edges.select(col("b").as("node"), col("a").as("nbr")))
    val init = res.select(col("node").as("nbr"), col("init_label"))
    val legal = adj.join(init, "nbr")
      .select(col("node"), col("init_label").as("cand"))
    val illegal = res.join(legal,
        res("node") === legal("node") && res("new_label") === legal("cand"),
        "left_anti")
    assert(illegal.count() == 0,
      "every adopted label must be some neighbor's initial label")
  }

  test("ar2_residual_backtest MAE matches a driver-side replay from the " +
      "fit query's own coefficients") {
    import graft.QueryDef.t
    val fit = graft.SparkEntry.queries("ar2_yulewalker_fit")(spark, sf).head()
    val (p1, p2) = (fit.getAs[Double]("phi1"), fit.getAs[Double]("phi2"))
    // densified daily series, rebuilt independently
    val perDay = t(spark, sf, "events")
      .groupBy(expr("CAST(ts AS DATE)").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val (d0, d1) = (perDay.keys.min, perDay.keys.max)
    val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(d => perDay.getOrElse(d, 0L).toDouble).toArray
    val mu = xs.sum / xs.length
    val es = (2 until xs.length).map { i =>
      math.round(1000.0 *
        (xs(i) - (mu + p1 * (xs(i - 1) - mu) + p2 * (xs(i - 2) - mu))))
    }
    val row = graft.SparkEntry.queries("ar2_residual_backtest")(spark, sf).head()
    assert(row.getLong(0) == es.length.toLong, "forecast-day count")
    assert(row.getLong(1) == es.map(math.abs).sum,
      s"quantized |e| sum: ${row.getLong(1)} vs ${es.map(math.abs).sum}")
  }

  test("log-rank O-E and variance replay from a driver-side sequential " +
      "pass over the at-risk table") {
    import graft.QueryDef.t
    val ev = t(spark, sf, "events")
    val fv = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("v_day"))
    val fp = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("p_day"))
      .join(fv, "user_id").filter(col("p_day") >= col("v_day"))
      .groupBy("user_id").agg(min(col("p_day")).as("p_day"))
    val maxDay = ev.agg(max(to_date(col("ts")))).head().getDate(0).toLocalDate
    val subj = fv.join(fp, Seq("user_id"), "left_outer")
      .select(col("user_id"), col("v_day"), col("p_day")).collect().map { r =>
        val v = r.getDate(1).toLocalDate
        val dur = Option(r.getDate(2)).map(p =>
          java.time.temporal.ChronoUnit.DAYS.between(v, p.toLocalDate))
          .getOrElse(java.time.temporal.ChronoUnit.DAYS.between(v, maxDay))
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"logrank:${r.getLong(0)}".getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString.take(15)
        (dur, r.getDate(2) != null, java.lang.Long.parseLong(h, 16) % 1000000L < 500000L)
      }
    var (n, n1) = (subj.length.toLong, subj.count(_._3).toLong)
    var (oeSum, vSum) = (0L, 0L)
    for (day <- subj.map(_._1).distinct.sorted) {
      val at = subj.filter(_._1 == day)
      val dd = at.count(_._2).toLong; val d1 = at.count(x => x._2 && x._3).toLong
      if (dd > 0 && n > 1) {
        val r0 = n1.toDouble / n.toDouble
        oeSum += math.round((d1.toDouble - dd.toDouble * n1.toDouble / n.toDouble) * 1e9)
        vSum += math.round(dd.toDouble * r0 * (1.0 - r0) *
          ((n - dd).toDouble / (n - 1).toDouble) * 1e9)
      }
      n -= at.length; n1 -= at.count(_._3)
    }
    val row = graft.SparkEntry.queries("survival_logrank_test")(spark, sf).head()
    assert(row.getLong(3) == oeSum, s"O-E nano: ${row.getLong(3)} vs $oeSum")
    assert(row.getLong(4) == vSum, s"V nano: ${row.getLong(4)} vs $vSum")
  }

  test("Theil decomposition: weighted within + between terms reassemble " +
      "the brute-force total Theil-T index") {
    import graft.QueryDef.t
    // independent brute force: per-customer revenue cents, unquantized
    val cents = t(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("cents"))
      .collect().map(_.getLong(1).toDouble)
    val (n, x) = (cents.length.toDouble, cents.sum)
    val tTotal = cents.map(c => (c / x) * math.log(c * n / x)).sum // nats
    val rows = graft.SparkEntry.queries("theil_inequality_decomp")(spark, sf)
      .collect().map(r => (r.getLong(2).toDouble,            // revenue_cents
        r.getAs[Double]("t_within_millinats"),
        r.getAs[Double]("between_contrib_millinats")))
    val xTot = rows.map(_._1).sum
    val reassembled = rows.map { case (xg, w, b) => (xg / xTot) * w + b }.sum
    // per-row ln quantization is ±0.5 millinat; revenue-weighted averages
    // keep it there, so the identity must hold within ~1 millinat
    assert(math.abs(reassembled - 1000.0 * tTotal) < 1.0,
      s"decomposition ${reassembled} vs brute ${1000.0 * tTotal} millinats")
    // and within-region inequality must dominate for this uniform synth
    assert(rows.map(_._2).min > math.abs(rows.map(_._3).sum),
      "between-region term should be small next to any within term")
  }
}
