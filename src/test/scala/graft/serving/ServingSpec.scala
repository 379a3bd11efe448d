package graft.serving

import graft.SparkSuite
import graft.cdc.{CdcSchemas, EnvelopeReader, Scd2}
import graft.cdc.CdcFixtures._

import org.apache.spark.sql.functions._

class ServingSpec extends SparkSuite {

  private val t0 = 1733333333000L

  test("saveHistory → spark.sql by name → current-state view (E3 contract)") {
    spark.sql("DROP TABLE IF EXISTS products_scd2_test")
    val d = tempDir("servelake")
    writeLake(d, Seq(
      envelope("null", productRow(Some(1), "w", "v1", 1.0), "c", t0, 100),
      envelope(productRow(Some(1), "w", "v1", 1.0),
               productRow(Some(1), "w", "v2", 2.0), "u", t0 + 1000, 200)))
    val hist = Scd2.transform(
      EnvelopeReader.readEnvelopes(spark, d.getAbsolutePath, CdcSchemas.productsRow),
      Seq("name", "description", "price"))

    ServingLayer.saveHistory(hist, "products_scd2_test")
    assert(spark.sql("SELECT * FROM products_scd2_test").count() == 2)

    ServingLayer.createCurrentStateView(spark, "products_scd2_test", "products_current")
    val cur = spark.sql("SELECT * FROM products_current WHERE is_current")
    assert(cur.count() == 1 && cur.head().getAs[Double]("price") == 2.0)

    // S9 append + S11 read-modify-overwrite cycle
    ServingLayer.appendRows(hist.limit(1), "products_scd2_test")
    assert(spark.table("products_scd2_test").count() == 3)
    ServingLayer.overwriteWith(spark, "products_scd2_test",
      spark.table("products_scd2_test").distinct())
    assert(spark.table("products_scd2_test").count() == 2)
    spark.sql("DROP TABLE products_scd2_test")
  }

  test("dynamic partition overwrite rewrites only touched partitions (S11 at scale)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS dyn_days")
    Seq((1L, "d1"), (2L, "d2"), (3L, "d3")).toDF("v", "day")
      .write.partitionBy("day").format("parquet").saveAsTable("dyn_days")
    def filesOf(day: String): Set[String] = spark.table("dyn_days")
      .filter(col("day") === day).select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    val d1Before = filesOf("d1")

    ServingLayer.overwritePartitions(
      Seq((20L, "d2")).toDF("v", "day"), "dyn_days")

    val rows = spark.table("dyn_days").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "d1"), (20L, "d2"), (3L, "d3")),
      "only d2 replaced; d1/d3 rows intact")
    assert(filesOf("d1") == d1Before,
      "untouched partitions keep their exact files — no table-wide rewrite")
    spark.sql("DROP TABLE dyn_days")
  }

  test("writeLake produces Hive partitions that prune (S7)") {
    val src = tempDir("wlsrc")
    writeLake(src, Seq(
      envelope("null", productRow(Some(1), "a", null, 1.0), "c", 1733333333000L, 1),
      envelope("null", productRow(Some(2), "b", null, 2.0), "c", 1736098133000L, 2))) // different month
    val env = EnvelopeReader.readEnvelopes(spark, src.getAbsolutePath, CdcSchemas.productsRow)

    val out = tempDir("wldst")
    EnvelopeReader.writeLake(env, out.getAbsolutePath)
    val back = spark.read.json(out.getAbsolutePath + "/year=*/month=*/day=*")
    assert(back.count() == 2)

    // partition pruning: reading one month's dir touches only that file
    val pruned = spark.read.json(out.getAbsolutePath)
      .filter(col("month") === 12)
    assert(pruned.count() == 1)
    val gzFiles = new java.io.File(out, "year=2024/month=12/day=04").listFiles()
    assert(gzFiles != null && gzFiles.exists(_.getName.endsWith(".json.gz")),
      "lake files must be gzipped like the reference sink")
  }

  test("bucketed tables join without any shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    val sf = "/root/testdata/sf0.001"
    ServingLayer.writeBucketed(
      spark.read.parquet(s"$sf/lineitem.parquet"), "li_bucketed", "l_orderkey", 8)
    ServingLayer.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet"), "ord_bucketed", "o_orderkey", 8)
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    val plan = joined.queryExecution.executedPlan
    val norm = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shufflesBeforeAgg = norm.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the join itself must be exchange-free; only the final groupBy may shuffle
    assert(shufflesBeforeAgg.size <= 1,
      s"bucketed join should not shuffle; found ${shufflesBeforeAgg.size} exchanges")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE ord_bucketed")
  }

  test("approx_count_distinct lands within rsd of exact") {
    val events = graft.QueryDef.t(spark, "/root/testdata/sf0.001", "events")
    val approx = events.agg(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
    val exact = events.agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }
}
