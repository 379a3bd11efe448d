package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the sweep-line max-concurrency must agree with the
  * obviously-correct brute force — for each key, the max over interval
  * starts of how many intervals [s, s+D) cover that start — on random
  * inputs including duplicate starts and back-to-back intervals (one
  * interval's end equal to another's start must NOT count as overlap).
  */
class SweepLineSpec extends SparkSuite {
  import spark.implicits._

  private val D = 10L

  private val gen = for {
    n <- Gen.choose(1, 80)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1, 5); s <- Gen.choose(0L, 100L)
    } yield (k, s))
  } yield rows

  test("sweep-line max concurrency == brute force on random intervals") {
    for (seed <- 1 to 10) {
      val rows = gen(Gen.Parameters.default, Seed(seed.toLong)).get
      val df = rows.toDF("key", "start")

      val got = SweepLine.maxConcurrent(df, "key", "start", lit(D))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

      val expected = rows.groupBy(_._1).map { case (k, rs) =>
        val starts = rs.map(_._2)
        val maxOpen = starts.map(p => starts.count(s => s <= p && p < s + D)).max
        (k, maxOpen.toLong, rs.size.toLong)
      }.toSet

      assert(got == expected, s"seed=$seed: sweep diverges from brute force")
    }
  }
}
