package graft.similarity

import graft.SparkSuite

import org.apache.spark.sql.functions._

/** The physical layout claim behind the IVF path ("corpus bucketed once;
  * probes touch one bucket" — CorpusQueries sim_ivf_* Scaladoc), made
  * checkable: persist the assigned corpus `bucketBy(centroid_id)` and
  * assert (a) an equality probe prunes to 1 of N buckets at the scan and
  * (b) a centroid-grouped aggregation runs with NO exchange — the bucketed
  * scan's hash partitioning already satisfies the distribution. At 100 TB
  * these are the two effects that turn each probe from a corpus scan into
  * a bucket read, and bucket-local stats (list sizes, norms) into
  * shuffle-free jobs.
  */
class BucketedCorpusSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("IVF corpus bucketed by centroid: probe prunes buckets, agg has no shuffle") {
    val assigned = graft.SparkEntry.queries("sim_ivf_assign")(spark, sf)
    spark.sql("DROP TABLE IF EXISTS ivf_corpus")
    assigned.write.mode("overwrite")
      .bucketBy(8, "centroid_id").sortBy("centroid_id")
      .saveAsTable("ivf_corpus")

    // autoBucketedScan's heuristic turns OFF bucketed reading for plans
    // that don't consume the hash partitioning — which also forfeits
    // bucket PRUNING on the probe filter. A real deployment disables the
    // heuristic on probe queries for exactly this reason.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val probe = spark.table("ivf_corpus").filter(col("centroid_id") === 3)
    probe.collect()
    val probePlan = probe.queryExecution.executedPlan.toString
    assert(probePlan.contains("SelectedBucketsCount: 1 out of 8"),
      s"probe should scan exactly one bucket:\n$probePlan")

    val agg = spark.table("ivf_corpus").groupBy("centroid_id")
      .agg(count(lit(1)).as("bucket_size"), avg("centroid_sim").as("avg_sim"))
    val rows = agg.collect()
    assert(rows.map(_.getLong(1)).sum == assigned.count(),
      "every assigned vector lands in exactly one bucket")
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"),
      s"bucketed layout must satisfy the groupBy distribution (no shuffle):\n$aggPlan")
    spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }
}
