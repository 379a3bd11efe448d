package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Dev-only: measure how the skew-sensitive catalog plans behave on a
  * HOT-KEY lake — the one scale hazard the uniform 10×/100× lakes cannot
  * exhibit (their copies multiply keys, never key mass). Production data
  * is never uniform: one tracked user, one house-brand supplier, one
  * retried order can own a double-digit share of a 100 TB fact table, and
  * the failure mode is not shuffle VOLUME but a straggler — one task
  * serializing a partition-sized key group while 999 executors idle.
  *
  *   runMain graft.SkewStress <sfDir> [hotPermille]
  *
  * Builds a variant lake (AtomicPublish, stamped) where `hotPermille`‰ of
  * `events` rows collapse onto one user_id and the same share of
  * `lineitem` rows onto one l_suppkey (an EXISTING supplier, so FK
  * semantics survive); all other tables copy through unchanged. Each probe
  * query then runs on the base and the skewed lake, printing paired
  * seconds plus the worst stage's straggler profile: max task ms / median
  * task ms within the stage carrying the most total task time. A plan
  * that holds shows straggler ≈ hot-share · tasks (the hot task does its
  * key's work, everything else proceeds); a plan that collapses shows
  * wall-time ≈ the hot task alone.
  *
  * Expected behavior by class (documented in PERF_NOTES r13):
  *  - per-key WINDOWS (events_sessionize): the hot key's group is
  *    indivisible by semantics — the straggler factor IS the hot share,
  *    and the mitigation is upstream (session-split or salt-and-merge),
  *    not a plan change;
  *  - equi+range joins (multi_touch_attribution): quadratic per hot key
  *    when planned as equi-join + residual — FIXED by day-binning the
  *    time axis into the join key (30%-hot: 22.9 s → 5.1 s, straggler
  *    1.2×; the residue is the answer itself);
  *  - two-level decomposed windows (weighted_median_price): the hot
  *    supplier's mass spreads over its DISTINCT price rows map-side, so
  *    the per-key group that reaches the window is value-domain-bounded;
  *  - salted joins (skew_salted_join): the salt fans the hot key across
  *    the configured factor by construction;
  *  - AQE skew-join splits cover shuffle JOINS (q21's orders join), which
  *    re-chunk a skewed partition without semantic limits.
  */
object SkewStress {

  private val probes = Seq("events_sessionize", "multi_touch_attribution",
    "window_funnel_depth", "weighted_median_price", "skew_salted_join",
    "q21_waiting_supplier", "mode_event_per_user")

  /** Per-stage task durations for the straggler profile. */
  private final class TaskMeter extends SparkListener {
    val byStage = new scala.collection.concurrent.TrieMap[Int, scala.collection.mutable.ArrayBuffer[Long]]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (t.taskInfo != null) {
      val buf = byStage.getOrElseUpdate(t.stageId, new scala.collection.mutable.ArrayBuffer[Long]())
      buf.synchronized { buf += t.taskInfo.duration }
    }
    def reset(): Unit = byStage.clear()
    /** (maxTaskMs, medianTaskMs, nTasks) of the stage with the most total task time. */
    def worstStage(): (Long, Long, Int) = {
      val stages = byStage.readOnlySnapshot().values.map(b => b.synchronized(b.toSeq))
        .filter(_.nonEmpty)
      if (stages.isEmpty) return (0L, 0L, 0)
      val worst = stages.maxBy(_.sum)
      val sorted = worst.sorted
      (sorted.last, sorted(sorted.size / 2), sorted.size)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val hotPermille = if (args.length > 1) args(1).toInt else 300
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    val hotUser = 424242424242L
    val skewed = AtomicPublish.ensure(s"/tmp/graft_skewed_p$hotPermille",
      s"src=$sfDir md5=${AtomicPublish.dirFingerprint(sfDir)} p=$hotPermille gen=1") { tmp =>
      val hotSupp = spark.read.parquet(s"$sfDir/supplier.parquet")
        .agg(min("s_suppkey")).head().getLong(0)
      Seq("region", "nation", "customer", "supplier", "part", "orders",
          "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
      }
      // pmod(hash) selects a deterministic ~hotPermille‰ row slice; the
      // chosen rows keep their event_id/orderkey identity, only the key
      // under test collapses
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("user_id",
          when(pmod(xxhash64(col("event_id")), lit(1000)) < hotPermille,
            lit(hotUser)).otherwise(col("user_id")))
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .withColumn("l_suppkey",
          when(pmod(xxhash64(col("l_orderkey"), col("l_partkey")), lit(1000)) < hotPermille,
            lit(hotSupp)).otherwise(col("l_suppkey")))
        .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    }

    val meter = new TaskMeter
    spark.sparkContext.addSparkListener(meter)
    println(f"[skew] hot share = ${hotPermille / 10.0}%.1f%% of events.user_id and lineitem.l_suppkey rows")
    probes.foreach { n =>
      val fn = SparkEntry.queries(n)
      def run(dir: String): (Double, Long, Long, Int) = {
        // best-of-2 wall; straggler profile from the measured (2nd) run
        val secs = (1 to 2).map { _ =>
          meter.reset()
          val t0 = System.nanoTime()
          fn(spark, dir).groupBy().count().collect()
          (System.nanoTime() - t0) / 1e9
        }
        org.apache.spark.GraftSparkInternals.drainListenerBus(spark.sparkContext)
        val (mx, md, nt) = meter.worstStage()
        (secs.min, mx, md, nt)
      }
      val (b, bMax, bMed, bN) = run(sfDir)
      val (k, kMax, kMed, kN) = run(skewed)
      val bStrag = if (bMed > 0) bMax.toDouble / bMed else -1.0
      val kStrag = if (kMed > 0) kMax.toDouble / kMed else -1.0
      println(f"[skew] $n%-28s base=$b%6.2fs (worst-stage max/med ${bMax}%5d/${bMed}%4d ms = $bStrag%5.1fx over $bN%3d tasks)  " +
        f"skewed=$k%6.2fs (${kMax}%5d/${kMed}%4d ms = $kStrag%5.1fx over $kN%3d tasks)")
    }
    spark.stop()
  }
}
