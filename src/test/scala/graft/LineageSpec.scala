package graft

/** Column-lineage extraction contracts over real catalog queries: the
  * sources the governance catalog would record for a materialized output
  * must name exactly the feeding table columns.
  */
class LineageSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("q1's aggregates trace to their lineitem source columns") {
    val lin = Lineage.columnLineage(
      SparkEntry.queries("q1_pricing_summary")(spark, sf))
    assert(lin.contains("sum_disc_price") || lin.contains("sum_qty"),
      s"expected q1 output columns, got ${lin.keySet}")
    val revenue = lin.getOrElse("sum_disc_price", Set.empty)
    assert(revenue.contains("lineitem.l_extendedprice") &&
      revenue.contains("lineitem.l_discount"),
      s"revenue lineage must name extendedprice+discount, got $revenue")
    val qty = lin.getOrElse("sum_qty", Set.empty)
    assert(qty == Set("lineitem.l_quantity"),
      s"sum_qty must trace to exactly l_quantity, got $qty")
  }

  test("scd2_history's validity columns trace through the window to events.ts") {
    val lin = Lineage.columnLineage(
      SparkEntry.queries("scd2_history")(spark, sf))
    val vt = lin.getOrElse("valid_to", Set.empty)
    assert(vt.contains("events.ts"),
      s"valid_to is a LEAD over ts — lineage must include events.ts, got $vt")
  }

  test("explode outputs trace to the generator's input column (r9 ADVICE: " +
      "Generate attributes are fresh non-Alias ExprIds)") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val lin = Lineage.columnLineage(d)
    assert(lin("tok") == Set("documents.text"),
      s"exploded token must trace to documents.text, got ${lin("tok")}")
    assert(lin("doc_id") == Set("documents.doc_id"), lin.toString)
  }

  test("union outputs merge per-position sources from every branch") {
    import org.apache.spark.sql.functions._
    val a = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("k"))
    val b = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("k"))
    val lin = Lineage.columnLineage(a.union(b))
    assert(lin("k") == Set("orders.o_orderkey", "lineitem.l_orderkey"),
      s"union column must carry both branches, got ${lin("k")}")
  }

  test("join outputs carry lineage from their own side only") {
    import org.apache.spark.sql.functions._
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), (col("l_extendedprice") * 2).as("dbl"))
    val j = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"), col("dbl"))
    val lin = Lineage.columnLineage(j)
    assert(lin("o_orderpriority") == Set("orders.o_orderpriority"), lin.toString)
    assert(lin("dbl") == Set("lineitem.l_extendedprice"), lin.toString)
  }
}
