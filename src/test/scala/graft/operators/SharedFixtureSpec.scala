package graft.operators

import graft.SparkSuite

/** Pins the session-scoped fixture cache's concurrency contract (ADVICE
  * r11): a fixture build runs AT MOST ONCE per (session, key) even when
  * the first consumers race — the pre-fix TrieMap.getOrElseUpdate could
  * run two builds and leak one persisted DataFrame with no owner.
  */
class SharedFixtureSpec extends SparkSuite {

  test("sharedFixture builds at most once per key under concurrent first use") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val tasks = (1 to threads).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long =
            AnalyticsQueries.sharedFixture(spark, "fixture-spec-race") {
              builds.incrementAndGet()
              spark.range(100).toDF("id").localCheckpoint(true)
            }.count()
        })
      }
      assert(tasks.map(_.get()).forall(_ == 100L))
    } finally pool.shutdown()
    assert(builds.get() == 1,
      s"fixture build ran ${builds.get()} times — the at-most-once lock is broken")
  }

  test("a consumer of a different key does not block behind an in-flight build") {
    // ADVICE r12: the r11 fix held the single per-session monitor for the
    // whole build, so ANY consumer — another key or an already-cached
    // fixture — queued behind an in-flight build. The r13 per-key lazy
    // holder confines blocking to same-key racers; this drives a build
    // that parks on a latch and proves an unrelated key still completes.
    val gate = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.CountDownLatch(1)
    val slow = new Thread(() => {
      AnalyticsQueries.sharedFixture(spark, "fixture-spec-slow") {
        started.countDown()
        gate.await()
        spark.range(1).toDF("id")
      }
      ()
    })
    slow.start()
    assert(started.await(30, java.util.concurrent.TimeUnit.SECONDS))
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val fast = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long =
          AnalyticsQueries.sharedFixture(spark, "fixture-spec-fast") {
            spark.range(5).toDF("id")
          }.count()
      })
      // under the old whole-map lock this get() parks until `gate` opens
      assert(fast.get(30, java.util.concurrent.TimeUnit.SECONDS) == 5L)
    } finally {
      gate.countDown()
      pool.shutdown()
      slow.join(30000)
    }
  }

  test("sharedFixture returns the same materialized plan to every consumer") {
    val a = AnalyticsQueries.sharedFixture(spark, "fixture-spec-identity") {
      spark.range(10).toDF("id").localCheckpoint(true)
    }
    val b = AnalyticsQueries.sharedFixture(spark, "fixture-spec-identity") {
      fail("second consumer must not rebuild"); a
    }
    assert(a eq b, "consumers must share one DataFrame handle")
  }
}
