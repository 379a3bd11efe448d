package graft.operators

import graft.QueryDef
import graft.QueryDef.t

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second tranche of TPC-H-shaped relational queries (SURVEY.md §2.4/§2.6
  * parity extras; §7.2 step 8) — the join/subquery shapes q7/q8/q9/q11/q13/
  * q15/q16/q17/q22 adapted to the testdata star schema. The testdata has no
  * `partsupp`, `l_commitdate`, `o_comment`, or `c_phone`, so the four
  * queries that need them are re-expressed on what exists (documented per
  * query); the OPERATOR shapes — multi-nation self-join on `nation`,
  * CASE-inside-aggregate market share, HAVING against a global scalar
  * subquery, left-join count distribution, view-max equality, NOT IN
  * anti-join under a distinct count, correlated-average filter, NOT EXISTS
  * over a date horizon — are the originals.
  *
  * Float-exactness policy matches [[RelationalQueries]]: per-row DOUBLE
  * arithmetic (IEEE-identical across engines) feeds DECIMAL sums (exact,
  * order-independent); only the final projection casts back to DOUBLE.
  *
  * Scale notes: every dimension side (`nation` self-join pair, `region`,
  * `supplier`, filtered `part`) is explicitly broadcast; `customer` and
  * `orders` shuffle on their keys like the fact table (they scale with the
  * data). The scalar-subquery thresholds (q11/q15/q17/q22) are 1-row (or
  * per-key) aggregates broadcast back — no driver-side collect anywhere.
  */
object TpchExtraQueries {

  /** revenue term: l_extendedprice * (1 - l_discount), decimal-exact. */
  private def revDec = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    .cast(DecimalType(18, 4))
  private val revSql =
    "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,4))"

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q7 shape: bidirectional nation-pair volume by ship year. The
    // nation dimension joins twice (supplier side, customer side) with a
    // disjunctive pair predicate — both sides broadcast; the fact chain
    // shuffles once per equi-join key.
    QueryDef(
      "q7_nation_volume",
      (s, d) => {
        val n1 = t(s, d, "nation").select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
        val n2 = t(s, d, "nation").select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
        val l = t(s, d, "lineitem")
          .filter(col("l_shipdate").between(
            lit(graft.Ts.utc("1996-01-01 00:00:00")), lit(graft.Ts.utc("1997-12-31 00:00:00"))))
        l.join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
          .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                  (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sum(revDec).cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT supp_nation, cust_nation, l_year,
              |  CAST(sum(volume) AS DOUBLE) AS revenue
              |FROM (
              |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |    CAST(year(l_shipdate) AS BIGINT) AS l_year, $revSql AS volume
              |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
              |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
              |    AND c_nationkey = n2.n_nationkey
              |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
              |GROUP BY supp_nation, cust_nation, l_year
              |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // TPC-H Q8 shape: national market share inside a region — a CASE
    // expression under both sides of a ratio of aggregates. Numerator and
    // denominator are separate exact decimal sums; the single final
    // division runs in double on both engines.
    QueryDef(
      "q8_market_share",
      (s, d) => {
        val n1 = t(s, d, "nation").select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
        val n2 = t(s, d, "nation").select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
        val r = t(s, d, "region").filter(col("r_name") === "AMERICA")
        val p = t(s, d, "part").filter(col("p_type") === "PROMO")
        val zero = lit(0).cast(DecimalType(18, 4))
        t(s, d, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
          .join(broadcast(r), col("n1_region") === col("r_regionkey"))
          .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg((sum(when(col("nation") === "NATION_5", revDec).otherwise(zero)).cast("double") /
                sum(revDec).cast("double")).as("mkt_share"))
          .orderBy("o_year")
      },
      Some(s"""SELECT o_year,
              |  CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume
              |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
              |    / CAST(sum(volume) AS DOUBLE) AS mkt_share
              |FROM (
              |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, $revSql AS volume,
              |    n2.n_name AS nation
              |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
              |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
              |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
              |    AND p_type = 'PROMO')
              |GROUP BY o_year ORDER BY o_year""".stripMargin)),

    // TPC-H Q9 shape: product profit by nation and year. Adaptation: the
    // schema has no partsupp, so supply cost is proxied as
    // 0.1 * p_retailprice * l_quantity — the per-row amount expression and
    // the LIKE-filtered part dimension are the Q9 operators.
    QueryDef(
      "q9_product_profit",
      (s, d) => {
        val amt = (revDec.cast("double") -
          lit(0.1) * col("p_retailprice") * col("l_quantity")).cast(DecimalType(18, 4))
        val p = t(s, d, "part").filter(col("p_name").like("%red%"))
        t(s, d, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(sum(amt).cast("double").as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
             |FROM (
             |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |    CAST(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,4))
             |         - CAST(0.1 AS DOUBLE) * p_retailprice * l_quantity AS DECIMAL(18,4)) AS amount
             |  FROM part, supplier, lineitem, orders, nation
             |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
             |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
             |    AND p_name LIKE '%red%')
             |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin)),

    // TPC-H Q11 shape: per-part value with HAVING against a global scalar
    // subquery over the same aggregate. Adaptation: value is
    // sum(l_extendedprice * l_quantity) for one nation's suppliers (no
    // partsupp). The per-part aggregate is computed once and reused for
    // both the rows and the broadcast 1-row threshold — exact decimal
    // comparison, no collect.
    QueryDef(
      "q11_important_parts",
      (s, d) => {
        val valDec = (col("l_extendedprice") * col("l_quantity")).cast(DecimalType(18, 4))
        val nat = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy("l_partkey")
          .agg(sum(valDec).as("value_dec"))
        val threshold = nat.agg(
          (sum(col("value_dec")) * lit(new java.math.BigDecimal("0.001"))).as("thresh"))
        nat.join(broadcast(threshold))
          .filter(col("value_dec") > col("thresh"))
          .select(col("l_partkey"), col("value_dec").cast("double").as("value"))
          .orderBy(col("value").desc, col("l_partkey"))
      },
      Some("""WITH nat AS (
             |  SELECT l_partkey, sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS value
             |  FROM lineitem, supplier, nation
             |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
             |    AND n_name = 'NATION_3'
             |  GROUP BY l_partkey)
             |SELECT l_partkey, CAST(value AS DOUBLE) AS value FROM nat
             |WHERE value > (SELECT sum(value) * CAST(0.001 AS DECIMAL(4,3)) FROM nat)
             |ORDER BY value DESC, l_partkey""".stripMargin)),

    // TPC-H Q13 shape: customer order-count distribution — LEFT OUTER join
    // with an extra non-key predicate (so unmatched customers survive with
    // count 0), then a second aggregation over the first's result.
    QueryDef(
      "q13_order_distribution",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
          "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey)
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q15 shape: top supplier by a windowed-quarter revenue "view",
    // selected by equality against the view's max (ties kept). The revenue
    // aggregate is computed once; its 1-row max is broadcast back — the
    // decimal comparison is exact so the equality is deterministic.
    QueryDef(
      "q15_top_supplier",
      (s, d) => {
        val revenue = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit(graft.Ts.utc("1996-01-01 00:00:00")) &&
                  col("l_shipdate") < lit(graft.Ts.utc("1996-04-01 00:00:00")))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(revDec).as("total_rev"))
        val best = revenue.agg(max(col("total_rev")).as("max_rev"))
        revenue.join(broadcast(best))
          .filter(col("total_rev") === col("max_rev"))
          .join(broadcast(t(s, d, "supplier")), col("supplier_no") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev").cast("double").as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH revenue AS (
              |  SELECT l_suppkey AS supplier_no, sum($revSql) AS total_rev
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |    AND l_shipdate < TIMESTAMP '1996-04-01'
              |  GROUP BY l_suppkey)
              |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
              |FROM supplier, revenue
              |WHERE s_suppkey = supplier_no
              |  AND total_rev = (SELECT max(total_rev) FROM revenue)
              |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q16 shape: supplier count per part attribute group, excluding
    // a NOT IN subquery of suppliers (negative balance stands in for the
    // complaints filter — no comment column). The exclusion list is
    // null-free so it compiles to a broadcast anti join under the distinct
    // count.
    QueryDef(
      "q16_supplier_cnt",
      (s, d) => {
        val bad = t(s, d, "supplier").filter(col("s_acctbal") < 0.0).select("s_suppkey")
        val p = t(s, d, "part")
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
                  col("p_size").isin(1, 5, 10, 15, 20, 25))
        t(s, d, "lineitem")
          .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM part, lineitem
             |WHERE p_partkey = l_partkey
             |  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
             |  AND p_size IN (1, 5, 10, 15, 20, 25)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // TPC-H Q17 shape: revenue from small-quantity orders — a correlated
    // per-part average under the filter. The per-part averages are a
    // second aggregate over the fact table joined back on partkey; the
    // 0.2×avg comparison is IEEE-identical (integral-double sums, one
    // division, one multiply).
    QueryDef(
      "q17_small_qty_revenue",
      (s, d) => {
        val partAvg = t(s, d, "lineitem")
          .groupBy(col("l_partkey").as("pk"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        val p = t(s, d, "part").filter(col("p_brand") === "Brand#2")
        t(s, d, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(partAvg, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double") /
                lit(7.0)).as("avg_yearly"))
      },
      Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |         / CAST(7.0 AS DOUBLE) AS avg_yearly
             |FROM lineitem, part
             |WHERE p_partkey = l_partkey AND p_brand = 'Brand#2'
             |  AND l_quantity < (
             |    SELECT CAST(0.2 AS DOUBLE) * avg(l_quantity) FROM lineitem l2
             |    WHERE l2.l_partkey = p_partkey)""".stripMargin)),

    // TPC-H Q22 shape: positive-balance average as a global scalar
    // subquery + NOT EXISTS anti join. Adaptation: "dormant" = no order
    // since 2000 (no c_phone country codes in the schema; every customer
    // has some order, so the original unconditioned NOT EXISTS is empty).
    // The average is an exact decimal sum over a double count — one
    // division on each engine.
    QueryDef(
      "q22_dormant_customers",
      (s, d) => {
        val c = t(s, d, "customer")
        val avgBal = c.filter(col("c_acctbal") > 0.0)
          .agg((sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double") /
                count(lit(1))).as("avg_bal"))
        val recent = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit(graft.Ts.utc("2000-01-01 00:00:00")))
          .select("o_custkey")
        c.join(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("totacctbal"))
          .orderBy("c_nationkey")
      },
      Some("""WITH bal AS (
             |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
             |  FROM customer WHERE c_acctbal > 0.0)
             |SELECT c_nationkey, count(*) AS numcust,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
             |FROM customer
             |WHERE c_acctbal > (SELECT avg_bal FROM bal)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // TPC-H Q2 shape: minimum-cost supplier per part within a region — a
    // correlated MIN subquery over the same derived cost table that feeds
    // the outer query. Adaptation: no partsupp, so supply cost is the
    // observed minimum unit price min(l_extendedprice / l_quantity) per
    // (part, supplier) — per-row IEEE double division on both engines, MIN
    // picks an element exactly. The correlated per-part minimum is a
    // window MIN over the already region-joined rows (one shuffle on
    // p_partkey, no second pass over the cost subtree); dimension sides
    // (scoped part, region-filtered supplier) broadcast.
    QueryDef(
      "q2_min_cost_supplier",
      (s, d) => {
        val costs = t(s, d, "lineitem")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("supplycost"))
        val p = t(s, d, "part")
          .filter(col("p_size") === 5 && col("p_type") === "STANDARD")
          .select("p_partkey", "p_name")
        val supp = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        val eligible = costs
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        eligible
          .withColumn("min_cost", min(col("supplycost")).over(Window.partitionBy("p_partkey")))
          .filter(col("supplycost") === col("min_cost"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_name"), col("supplycost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH costs AS (
             |  SELECT l_partkey, l_suppkey,
             |    min(l_extendedprice / l_quantity) AS supplycost
             |  FROM lineitem GROUP BY l_partkey, l_suppkey)
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
             |FROM part, costs, supplier, nation, region
             |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
             |  AND p_size = 5 AND p_type = 'STANDARD'
             |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |  AND r_name = 'EUROPE'
             |  AND supplycost = (
             |    SELECT min(c2.supplycost)
             |    FROM costs c2, supplier s2, nation n2, region r2
             |    WHERE c2.l_partkey = p_partkey AND c2.l_suppkey = s2.s_suppkey
             |      AND s2.s_nationkey = n2.n_nationkey
             |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
             |LIMIT 100""".stripMargin)),

    // TPC-H Q20 shape: nested semi-join chain — suppliers (in one nation)
    // who shipped a large aggregate quantity of some LIKE-scoped part in
    // one year: s_suppkey IN (... l_partkey IN (...) GROUP BY HAVING ...).
    // Adaptation: the HAVING threshold is a constant (no partsupp
    // availability to halve) tuned so the result is NON-EMPTY at sf0.01
    // and sf0.1 (r8 verdict: the old green%/300 combination returned 0
    // oracle rows — a vacuous hash match). The part scope broadcasts into
    // the fact scan; the HAVING aggregate shuffles on (partkey, suppkey);
    // the final supplier membership is a broadcast semi join.
    QueryDef(
      "q20_excess_shippers",
      (s, d) => {
        val redParts = t(s, d, "part")
          .filter(col("p_name").like("red%")).select("p_partkey")
        val bigPairs = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit(graft.Ts.utc("1996-01-01 00:00:00")) &&
                  col("l_shipdate") < lit(graft.Ts.utc("1997-01-01 00:00:00")))
          .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
          .filter(col("qty") > 40)
          .select("l_suppkey")
        t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_7")),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
          .join(bigPairs, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_name", "s_acctbal")
          .orderBy("s_name")
      },
      Some("""SELECT s_name, s_acctbal FROM supplier
             |WHERE s_suppkey IN (
             |    SELECT l_suppkey FROM lineitem
             |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
             |      AND l_shipdate >= TIMESTAMP '1996-01-01'
             |      AND l_shipdate < TIMESTAMP '1997-01-01'
             |    GROUP BY l_partkey, l_suppkey
             |    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 40)
             |  AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_7')
             |ORDER BY s_name""".stripMargin)),

    // TPC-H Q21 shape: double-correlated EXISTS + NOT EXISTS against the
    // same fact table — suppliers who were the ONLY late shipper on a
    // multi-supplier finished order. Adaptation: no commit/receipt dates,
    // so "late" = shipped more than 60 days after the order date. The
    // correlated pair is answered from ONE per-orderkey aggregate pass,
    // never a fact self-join: EXISTS(other supplier on the order) ⟺
    // min(l_suppkey) ≠ max(l_suppkey) per order, NOT EXISTS(other LATE
    // supplier) ⟺ the late lines' per-order supplier range is degenerate
    // (and then all late lines belong to that one supplier, so its
    // numwait contribution is the order's late-line count). Restricting
    // the aggregate to F-orders is lossless — the EXISTS probe rows share
    // l1's orderkey, hence l1's F order. Scale shape (r11 verdict task
    // #4, cutting the 106 MB 10× shuffle): lineitem is scanned once with
    // a 3-column projection, shuffled ONCE into the orders join, and the
    // per-order aggregate reuses that join's orderkey partitioning — the
    // r7 semi/anti formulation was quadratic within multi-line orders
    // (75× at 10×), and the r8 three-aggregate form still shuffled the
    // fact table twice plus two semi joins.
    QueryDef(
      "q21_waiting_supplier",
      (s, d) => {
        val orders = t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        val perOrder = t(s, d, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(orders, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
              .as("late"))
          .groupBy("l_orderkey")
          .agg(min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"),
            min(when(col("late"), col("l_suppkey"))).as("lmin"),
            max(when(col("late"), col("l_suppkey"))).as("lmax"),
            sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
          .filter(col("smin") =!= col("smax") &&
            col("lmin").isNotNull && col("lmin") === col("lmax"))
        perOrder
          .join(broadcast(t(s, d, "supplier")
              .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_4")),
                col("s_nationkey") === col("n_nationkey"), "left_semi")),
            col("lmin") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(sum(col("n_late")).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM supplier, lineitem l1, orders, nation
             |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
             |  AND o_orderstatus = 'F'
             |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_orderkey = o3.o_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND o3.o_orderstatus = 'F'
             |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
             |  AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
             |GROUP BY s_name ORDER BY numwait DESC, s_name
             |LIMIT 100""".stripMargin)))
}
