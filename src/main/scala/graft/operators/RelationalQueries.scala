package graft.operators

import graft.QueryDef
import graft.QueryDef.t

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational surface (SURVEY.md §2.3 joins, §2.4 aggregates, §2.6
  * sorts/limits/set-ops, §2.7 CTE composition) over the TPC-H-ish testdata.
  *
  * Float-exactness policy for the DuckDB oracle: every SUM over non-integral
  * doubles goes through a per-row DECIMAL cast (per-row double arithmetic is
  * IEEE-deterministic and engine-identical; decimal summation is exact and
  * order-independent), then the final value is cast back to DOUBLE (exact).
  * Sums of integral doubles (quantities, counts) are exact in double below
  * 2^53 regardless of order, so they stay plain.
  *
  * Scale notes: aggregations are partial-aggregated map-side by Spark
  * automatically; the dimension sides of every join here (region, nation,
  * customer-filtered) are broadcast — verified via explain in the test
  * suite — so the only shuffles are the agg exchanges on the fact table.
  */
object RelationalQueries {

  /** revenue term: l_extendedprice * (1 - l_discount), decimal-exact. */
  private def revDec = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    .cast(DecimalType(18, 4))
  private val revSql =
    "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,4))"

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape: the full scan+agg workhorse. Exercises multi-key
    // groupBy, sum/avg/count, arithmetic. Filter prunes by shipdate so the
    // parquet scan sees a pushed predicate.
    QueryDef(
      "q1_pricing_summary",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit(graft.Ts.utc("2001-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
          sum(revDec).cast("double").as("sum_disc_price"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |  avg(l_quantity) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // TPC-H Q3 shape: selective dim filter → join fact → agg → top-k.
    // customer(filtered) is broadcast; orders⋈lineitem shuffles on orderkey.
    QueryDef(
      "q3_shipping_priority",
      (s, d) => {
        val cut = lit(graft.Ts.utc("1998-06-01 00:00:00"))
        val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders").filter(col("o_orderdate") < cut)
        val l = t(s, d, "lineitem").filter(col("l_shipdate") > cut)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate")
          .agg(sum(revDec).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate,
              |  CAST(sum($revSql) AS DOUBLE) AS revenue
              |FROM customer, orders, lineitem
              |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
              |  AND l_orderkey = o_orderkey
              |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
              |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
              |GROUP BY l_orderkey, o_orderdate
              |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q5 shape: 6-way join snowflake → per-nation revenue. The
    // region→nation→supplier chain is broadcast end-to-end.
    QueryDef(
      "q5_local_supplier_volume",
      (s, d) => {
        val r = t(s, d, "region").filter(col("r_name") === "ASIA")
        val n = t(s, d, "nation")
        val c = t(s, d, "customer")
        val sup = t(s, d, "supplier")
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit(graft.Ts.utc("1996-01-01 00:00:00")) &&
                  col("o_orderdate") < lit(graft.Ts.utc("1998-01-01 00:00:00")))
        val l = t(s, d, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey") &&
                   col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(revDec).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name, CAST(sum($revSql) AS DOUBLE) AS revenue
              |FROM customer, orders, lineitem, supplier, nation, region
              |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              |  AND r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // TPC-H Q6 shape: pure filter + global sum — the simplest possible
    // scan-bound query, and the canonical pushdown check: all three
    // predicates reach the parquet scan, the projection reads exactly two
    // columns, and the single-row aggregate is map-side partial + one
    // 1-row exchange. At 100 TB this is bandwidth-bound, as it should be.
    QueryDef(
      "q6_forecast_revenue",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit(graft.Ts.utc("1996-01-01 00:00:00")) &&
                col("l_shipdate") < lit(graft.Ts.utc("1997-01-01 00:00:00")) &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast(DecimalType(18, 4))).cast("double").as("revenue")),
      Some("""SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // TPC-H Q10 shape: returned-item revenue per customer — fact⋈fact
    // shuffle join (orders⋈lineitem on orderkey) + agg + top-k. nation is
    // broadcast; customer is deliberately NOT hinted: it scales with the
    // fact tables (unlike nation/region), so at 100 TB it must shuffle-join
    // on custkey — locally AQE picks broadcast from its actual size. The
    // returnflag and orderdate filters cut both fact sides pre-shuffle.
    QueryDef(
      "q10_returned_items",
      (s, d) => {
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit(graft.Ts.utc("1996-07-01 00:00:00")) &&
                  col("o_orderdate") < lit(graft.Ts.utc("1996-10-01 00:00:00")))
        val l = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(sum(revDec).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
              |  CAST(sum($revSql) AS DOUBLE) AS revenue
              |FROM customer, orders, lineitem, nation
              |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              |  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
              |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
              |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
              |GROUP BY c_custkey, c_name, c_acctbal, n_name
              |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // J3/J4: EXISTS → left-semi (init_duckdb.sh:64-68 shape).
    QueryDef(
      "semi_join_exists",
      (s, d) => {
        val big = t(s, d, "lineitem").filter(col("l_quantity") >= 49)
        t(s, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
      },
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)""".stripMargin)),

    // J1/J2/P4: NOT EXISTS → left-anti (scd2.sql:8-12, init_duckdb.sh:48-53).
    QueryDef(
      "anti_join_not_exists",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal"),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin)),

    // J4: IN (subquery) → left-semi through a broadcast dim chain.
    QueryDef(
      "in_subquery_semi",
      (s, d) => {
        val asiaNations = t(s, d, "nation")
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
                col("n_regionkey") === col("r_regionkey"), "left_semi")
        t(s, d, "supplier")
          .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"), "left_semi")
          .select("s_suppkey", "s_name", "s_acctbal")
      },
      Some("""SELECT s_suppkey, s_name, s_acctbal FROM supplier
             |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN
             |  (SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))""".stripMargin)),

    // J1 verbatim shape (scd2.sql:8-12): LEFT OUTER equi+theta join with a
    // null-rejecting residual filter (P4) — written as the reference wrote
    // it; Catalyst's RewritePredicateSubquery/join planning turns the
    // null-filtered outer join into an anti join.
    QueryDef(
      "left_join_null_residual",
      (s, d) => {
        val l = t(s, d, "lineitem").filter(col("l_linenumber") === 1)
          .select("l_orderkey", "l_shipdate", "l_extendedprice")
        val o = t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("h_orderkey"), col("o_orderdate"))
        l.join(o, col("l_orderkey") === col("h_orderkey") &&
                  col("o_orderdate") <= col("l_shipdate"), "left_outer")
          .filter(col("h_orderkey").isNull)
          .select("l_orderkey", "l_extendedprice")
      },
      Some("""SELECT l_orderkey, l_extendedprice
             |FROM (SELECT l_orderkey, l_shipdate, l_extendedprice
             |      FROM lineitem WHERE l_linenumber = 1) l
             |LEFT JOIN (SELECT o_orderkey AS h_orderkey, o_orderdate
             |           FROM orders WHERE o_orderpriority = '1-URGENT') h
             |  ON l.l_orderkey = h.h_orderkey AND h.o_orderdate <= l.l_shipdate
             |WHERE h.h_orderkey IS NULL""".stripMargin)),

    // O1/O2: deterministic top-k (unique tiebreak on the key).
    QueryDef(
      "sort_limit_topk",
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // O3: UNION / INTERSECT / EXCEPT (set semantics).
    QueryDef(
      "set_ops",
      (s, d) => {
        val buyers = t(s, d, "orders").select(col("o_custkey").as("c_custkey")).distinct()
        val building = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val machinery = t(s, d, "customer").filter(col("c_mktsegment") === "MACHINERY")
          .select("c_custkey")
        building.union(machinery).distinct()
          .intersect(buyers)
          .except(t(s, d, "customer").filter(col("c_acctbal") < 0).select("c_custkey"))
      },
      Some("""(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             | UNION SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
             |INTERSECT SELECT DISTINCT o_custkey AS c_custkey FROM orders
             |EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal < 0""".stripMargin)),

    // O3 multiset variants: INTERSECT ALL / EXCEPT ALL keep duplicate
    // multiplicities (min-count / count-difference semantics). Parenthesized
    // in the oracle — INTERSECT binds tighter than EXCEPT in DuckDB.
    QueryDef(
      "set_ops_all",
      (s, d) => {
        val li = t(s, d, "lineitem")
        li.filter(col("l_returnflag") === "R").select("l_suppkey")
          .intersectAll(li.filter(col("l_linestatus") === "F").select("l_suppkey"))
          .exceptAll(li.filter(col("l_discount") > 0.08).select("l_suppkey"))
      },
      Some("""(SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
             | INTERSECT ALL
             | SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F')
             |EXCEPT ALL
             |SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08""".stripMargin)),

    // §2.4: distinct aggregates (exact).
    QueryDef(
      "distinct_counts",
      (s, d) => t(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n_rows")),
      Some("""SELECT count(DISTINCT l_partkey) AS distinct_parts,
             |  count(DISTINCT l_suppkey) AS distinct_supps,
             |  count(*) AS n_rows FROM lineitem""".stripMargin)),

    // §2.5 framed window: running per-customer spend (ROWS UNBOUNDED
    // PRECEDING..CURRENT), decimal-exact.
    QueryDef(
      "window_running_sum",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("running_spend"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
             |FROM orders""".stripMargin)),

    // §2.7 CTE chain (WITH a AS (...), b AS (...) SELECT …): per-segment
    // order stats via two chained derived tables, mirroring the reference's
    // cdc_events→ranked_events structure.
    QueryDef(
      "cte_chain",
      (s, d) => {
        val perCust = t(s, d, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
               sum(col("o_totalprice").cast(DecimalType(18, 2))).as("spend_dec"))
        val joined = perCust.join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        joined.groupBy("c_mktsegment")
          .agg(sum("n_orders").as("total_orders"),
               sum("spend_dec").cast("double").as("total_spend"),
               count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH per_cust AS (
             |  SELECT o_custkey, count(*) AS n_orders,
             |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
             |  FROM orders GROUP BY o_custkey),
             |joined AS (
             |  SELECT c_mktsegment, n_orders, spend_dec
             |  FROM per_cust JOIN customer ON o_custkey = c_custkey)
             |SELECT c_mktsegment, CAST(sum(n_orders) AS BIGINT) AS total_orders,
             |       CAST(sum(spend_dec) AS DOUBLE) AS total_spend,
             |       count(*) AS n_customers
             |FROM joined GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Correlated scalar subquery — a distinct operator from EXISTS/IN:
    // Catalyst decorrelates it into a left-outer aggregate join
    // (RewriteCorrelatedScalarSubquery), so the per-row lookup the SQL
    // expresses never executes row-at-a-time.
    QueryDef(
      "scalar_subquery_corr",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders_v")
        t(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT o_orderkey, o_totalprice,
                |  (SELECT count(*) FROM lineitem_v l
                |   WHERE l.l_orderkey = o.o_orderkey) AS n_items
                |FROM orders_v o WHERE o_orderkey < 1000""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |  (SELECT count(*) FROM lineitem l
             |   WHERE l.l_orderkey = o.o_orderkey) AS n_items
             |FROM orders o WHERE o_orderkey < 1000""".stripMargin)),

    // NOT IN (subquery) — null-aware anti join, tri-valued-logic cousin of
    // NOT EXISTS: one NULL in the subquery output empties the result, so
    // Spark plans a dedicated null-aware join instead of a plain anti.
    QueryDef(
      "not_in_null_aware",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("customer_v")
        t(s, d, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT c_custkey, c_mktsegment FROM customer_v
                |WHERE c_custkey NOT IN
                |  (SELECT o_custkey FROM orders_v WHERE o_totalprice > 400000)""".stripMargin)
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE c_custkey NOT IN
             |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""".stripMargin)),

    // Skew-salted join, driver-visible: events.event_type has ~5 hot
    // values owning ~20% of the table each — the shape where one reducer
    // task owns a whole key. Salting.saltedJoin spreads each hot key over
    // 8 salt buckets (deterministic event_id hash — safe under task retry)
    // while the 5-row dim side replicates 8×. The oracle is the PLAIN
    // join: salting must be a pure execution-layer rewrite with zero
    // semantic footprint, and the hash gate proves it row-for-row.
    QueryDef(
      "skew_salted_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val dim = ev.groupBy("event_type").agg(count(lit(1)).as("type_count"))
        Salting.saltedJoin(ev, dim, Seq("event_type"), factor = 8, uniqueCol = "event_id")
          .select(col("event_id"), col("event_type"), col("type_count"))
      },
      Some("""SELECT event_id, e.event_type, type_count
             |FROM events e
             |JOIN (SELECT event_type, count(*) AS type_count
             |      FROM events GROUP BY 1) d
             |ON e.event_type = d.event_type""".stripMargin)),

    // TPC-H Q4 shape (adapted: testdata has no commit/receipt dates, so the
    // EXISTS probes returned lines instead): date-windowed orders count by
    // priority where at least one line was returned. The EXISTS plans as a
    // left-semi join on orderkey — the lineitem side is filtered BEFORE the
    // shuffle, so only 'R' lines move.
    QueryDef(
      "q4_order_priority",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderdate") >= lit(graft.Ts.utc("1996-07-01 00:00:00")) &&
                col("o_orderdate") < lit(graft.Ts.utc("1997-07-01 00:00:00")))
        .join(t(s, d, "lineitem").filter(col("l_returnflag") === "R"),
              col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // TPC-H Q12 shape (adapted: l_linestatus stands in for shipmode):
    // conditional aggregation over a fact⋈fact join — the CASE folds the
    // priority dimension into two counters per group, so the output is 2
    // rows however large the join is. Oracle counts are CAST to BIGINT
    // (DuckDB sums integers into HUGEINT, which the comparator can't hash).
    QueryDef(
      "q12_priority_by_status",
      (s, d) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        t(s, d, "orders")
          .join(t(s, d, "lineitem")
            .filter(col("l_shipdate") >= lit(graft.Ts.utc("1996-01-01 00:00:00")) &&
                    col("l_shipdate") < lit(graft.Ts.utc("1997-01-01 00:00:00"))),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("l_linestatus")
          .agg(
            sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // TPC-H Q14 shape: promo revenue share. Both sums are decimal-exact;
    // the ratio is computed AFTER both casts to double, as pure double
    // arithmetic (engine-identical IEEE ops) — never decimal division,
    // whose scale/rounding rules differ between engines. part is broadcast.
    QueryDef(
      "q14_promo_revenue",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit(graft.Ts.utc("1997-01-01 00:00:00")) &&
                col("l_shipdate") < lit(graft.Ts.utc("1997-07-01 00:00:00")))
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", revDec)
            .otherwise(lit(0).cast(DecimalType(18, 4)))).cast("double").as("promo_revenue"),
          sum(revDec).cast("double").as("total_revenue"))
        .withColumn("promo_share",
          lit(100.0) * col("promo_revenue") / col("total_revenue")),
      Some(s"""WITH agg AS (
              |  SELECT
              |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revSql
              |                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
              |    CAST(sum($revSql) AS DOUBLE) AS total_revenue
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              |    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00')
              |SELECT promo_revenue, total_revenue,
              |  CAST(100.0 AS DOUBLE) * promo_revenue / total_revenue AS promo_share
              |FROM agg""".stripMargin)),

    // TPC-H Q18 shape: large-quantity orders — a HAVING-filtered aggregate
    // reused as a join input. The groupBy(l_orderkey) agg shuffles once on
    // orderkey and its output (99th-percentile tail) is tiny, so the join
    // back to orders broadcasts under AQE at any scale where the filter is
    // selective. sum(l_quantity) sums integral doubles: exact, no cast.
    QueryDef(
      "q18_large_orders",
      (s, d) => {
        val big = t(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum("l_quantity").as("sum_qty"))
          .filter(col("sum_qty") > 250)
        t(s, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
                  col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
             |FROM orders
             |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING sum(l_quantity) > 250) big ON o_orderkey = l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // TPC-H Q19 shape: disjunctive join predicate (OR of brand/size/qty
    // bands). Catalyst extracts the common l_partkey=p_partkey equi-key and
    // derives per-side filters from the OR (l_quantity BETWEEN 1 AND 50,
    // p_size BETWEEN 1 AND 50 here) so both scans prune before the
    // broadcast join; the full disjunction evaluates as the join residual.
    QueryDef(
      "q19_disjunctive_pred",
      (s, d) => {
        val bands =
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 10) &&
             col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#19" && col("p_size").between(10, 25) &&
             col("l_quantity").between(15, 30)) ||
          (col("p_brand") === "Brand#17" && col("p_size").between(25, 50) &&
             col("l_quantity").between(30, 50))
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part")),
                col("l_partkey") === col("p_partkey") && bands)
          .agg(sum(revDec).cast("double").as("revenue"),
               count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT CAST(sum($revSql) AS DOUBLE) AS revenue, count(*) AS n_lines
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 10
              |       AND l_quantity BETWEEN 1 AND 15)
              |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 25
              |       AND l_quantity BETWEEN 15 AND 30)
              |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 25 AND 50
              |       AND l_quantity BETWEEN 30 AND 50)""".stripMargin)),

    // J-family completion: FULL OUTER join — the one outer-join flavor the
    // catalog lacked. Reconciles two deliberately-overlapping-but-unequal
    // keyed sides (high-balance customers vs recent buyers) and tags each
    // row with which side(s) it came from — the standard lake
    // reconciliation shape. Shuffle-join on custkey on both sides; neither
    // side is broadcastable at scale (both derive from fact-sized tables).
    QueryDef(
      "full_outer_reconcile",
      (s, d) => {
        val cust = t(s, d, "customer").filter(col("c_acctbal") > 5000)
          .select("c_custkey", "c_mktsegment")
        val recent = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit(graft.Ts.utc("2000-01-01 00:00:00")))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_recent_orders"))
        cust.join(recent, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            when(col("c_custkey").isNull, "orders_only")
              .when(col("o_custkey").isNull, "customer_only")
              .otherwise("both").as("presence"),
            coalesce(col("n_recent_orders"), lit(0L)).as("n_recent_orders"))
      },
      Some("""SELECT
             |  COALESCE(c_custkey, o_custkey) AS custkey,
             |  CASE WHEN c_custkey IS NULL THEN 'orders_only'
             |       WHEN o_custkey IS NULL THEN 'customer_only'
             |       ELSE 'both' END AS presence,
             |  COALESCE(n_recent_orders, 0) AS n_recent_orders
             |FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000) c
             |FULL JOIN (SELECT o_custkey, count(*) AS n_recent_orders
             |           FROM orders
             |           WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
             |           GROUP BY o_custkey) o
             |ON c_custkey = o_custkey""".stripMargin)),

    // Correlated LATERAL subquery — the remaining correlation surface next
    // to EXISTS/IN (§2.3): top-3 customers by balance per nation, written
    // as LATERAL in BOTH engines. Catalyst decorrelates the LIMIT-under-
    // correlation into a partitioned rank (DuckDB does the equivalent
    // dependent-join unnesting), so the execution is the WindowGroupLimit
    // shape, never nation × customer nested-loop re-execution. The
    // explicit custkey tiebreak keeps LIMIT membership engine-stable.
    QueryDef(
      "lateral_topn_per_nation",
      (s, d) => {
        t(s, d, "nation").createOrReplaceTempView("nation_v")
        t(s, d, "customer").createOrReplaceTempView("customer_v")
        s.sql("""SELECT n_name, c_custkey, c_acctbal
                |FROM nation_v,
                |LATERAL (SELECT c_custkey, c_acctbal FROM customer_v
                |         WHERE c_nationkey = n_nationkey
                |         ORDER BY c_acctbal DESC, c_custkey LIMIT 3)""".stripMargin)
      },
      Some("""SELECT n_name, c_custkey, c_acctbal
             |FROM nation,
             |LATERAL (SELECT c_custkey, c_acctbal FROM customer
             |         WHERE c_nationkey = n_nationkey
             |         ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t""".stripMargin)),

    // WITH RECURSIVE (Spark 4's UnionLoop): bounded path expansion over
    // the event-type transition graph. The recursion runs over the
    // AGGREGATED edge catalog — |event types|² rows, scale-free — never
    // the raw event stream. r17 (guide §2.4/§3.3): UnionLoop inlines a
    // plain CTE into the loop BODY, so the data-sized leg (events scan +
    // per-user LEAD window + distinct) re-executed on EVERY iteration —
    // 4 full passes over the lake for one edge catalog (measured in the
    // committed before-plan: the Window sits under UnionLoop). The edge
    // derivation is now materialized ONCE (eager localCheckpoint — the
    // house lineage-pin) and only the scale-free edge table enters the
    // loop; at 100 TB the loop body goes from 4 lake scans to 4 joins
    // against a |types|² relation. Same edge set, same recursion, same
    // rows — oracle unchanged.
    // Depth is capped by a counter column (4 hops), keeping the loop
    // finite on both engines without relying on engine-level recursion
    // limits.
    QueryDef(
      "recursive_cte_paths",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("events_v")
        val edges = s.sql("""SELECT DISTINCT src, dst FROM (
                |  SELECT event_type AS src,
                |    LEAD(event_type) OVER (PARTITION BY user_id
                |                           ORDER BY ts, event_id) AS dst
                |  FROM events_v) WHERE dst IS NOT NULL""".stripMargin)
          .localCheckpoint(true)
        edges.createOrReplaceTempView("rec_cte_edges_v")
        s.sql("""WITH RECURSIVE paths(path, terminal, depth) AS (
                |  SELECT 'signup', 'signup', 1
                |  UNION ALL
                |  SELECT concat(p.path, '>', e.dst), e.dst, p.depth + 1
                |  FROM paths p JOIN rec_cte_edges_v e ON p.terminal = e.src
                |  WHERE p.depth < 4)
                |SELECT path, terminal, CAST(depth AS BIGINT) AS depth
                |FROM paths""".stripMargin)
      },
      Some("""WITH RECURSIVE edges AS (
             |  SELECT DISTINCT src, dst FROM (
             |    SELECT event_type AS src,
             |      LEAD(event_type) OVER (PARTITION BY user_id
             |                             ORDER BY ts, event_id) AS dst
             |    FROM events) WHERE dst IS NOT NULL),
             |paths(path, terminal, depth) AS (
             |  SELECT 'signup', 'signup', 1
             |  UNION ALL
             |  SELECT p.path || '>' || e.dst, e.dst, p.depth + 1
             |  FROM paths p JOIN edges e ON p.terminal = e.src
             |  WHERE p.depth < 4)
             |SELECT path, terminal, CAST(depth AS BIGINT) AS depth
             |FROM paths""".stripMargin)),

    // Ordered string aggregation (LISTAGG): per language, the CSV of its
    // distinct sources. collect_set is unordered BY CONTRACT on a
    // distributed engine, so determinism comes from array_sort before the
    // join — the only way a listagg is reproducible at any scale (an
    // ORDER BY inside the aggregate would impose a per-group sort anyway;
    // this makes the contract explicit). Per-group state is the distinct
    // set, map-side combined.
    QueryDef(
      "string_agg_sources",
      (s, d) => t(s, d, "documents")
        .groupBy("lang")
        .agg(
          array_join(array_sort(collect_set(col("source"))), ",").as("sources_csv"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang"),
      Some("""SELECT lang,
             |  string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): a nullable
    // join key — NULL here means "no return flag recorded" — must match
    // its own NULL dimension row instead of silently dropping (the
    // standard-equality behavior that loses the whole NULL slice in a
    // reconciliation). Each fact row joins exactly its own group, so
    // n_joined == n_dim per key INCLUDING the NULL key; a plain `=` would
    // hash-fail by losing that row. Spark plans <=> as a hash join on a
    // null-wrapped key — same exchange as any equi-join at scale.
    QueryDef(
      "null_safe_join",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(expr("nullif(l_returnflag, 'N')").as("rf_a"))
        val dim = t(s, d, "lineitem")
          .select(expr("nullif(l_returnflag, 'N')").as("rf"))
          .groupBy("rf").agg(count(lit(1)).as("n_dim"))
        li.join(broadcast(dim), col("rf_a") <=> col("rf"))
          .groupBy("rf", "n_dim")
          .agg(count(lit(1)).as("n_joined"))
          .select(col("rf"), col("n_dim"), col("n_joined"))
          .orderBy(col("rf").asc_nulls_first)
      },
      Some("""WITH li AS (SELECT nullif(l_returnflag, 'N') AS rf FROM lineitem),
             |dim AS (SELECT rf, CAST(count(*) AS BIGINT) AS n_dim
             |        FROM li GROUP BY rf)
             |SELECT d.rf, d.n_dim, CAST(count(*) AS BIGINT) AS n_joined
             |FROM li a JOIN dim d ON a.rf IS NOT DISTINCT FROM d.rf
             |GROUP BY d.rf, d.n_dim ORDER BY d.rf NULLS FIRST""".stripMargin)),

    // Aggregate-function breadth: count_if and the boolean aggregates
    // (bool_and/bool_or) — the predicate-summary layer dashboards ask
    // for; all exact (counts + three-valued boolean folds over exact
    // comparisons on stored doubles).
    QueryDef(
      "agg_predicate_funcs",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count_if(col("l_quantity") > 25).as("n_bulk"),
          count_if(col("l_discount") === 0.0).as("n_undiscounted"),
          expr("bool_and(l_extendedprice > 900)").as("all_above_floor"),
          expr("bool_or(l_discount > 0.08)").as("any_deep_discount"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(count(*) FILTER (l_quantity > 25) AS BIGINT) AS n_bulk,
             |  CAST(count(*) FILTER (l_discount = 0.0) AS BIGINT) AS n_undiscounted,
             |  bool_and(l_extendedprice > 900) AS all_above_floor,
             |  bool_or(l_discount > 0.08) AS any_deep_discount
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)))
}
