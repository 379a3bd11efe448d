package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: AsOfJoin (union+window formulation) must agree with the
  * obviously-correct brute-force definition — for each left row, scan all
  * right rows with the same key and pick max (t, seq) among those with
  * t' <= t — on random inputs including duplicate timestamps and keys with
  * no matches.
  */
class AsOfJoinPropertySpec extends SparkSuite {
  import spark.implicits._

  private val gen = for {
    nR <- Gen.choose(0, 60)
    nL <- Gen.choose(1, 60)
    rights <- Gen.listOfN(nR, for {
      k <- Gen.choose(1, 6); t <- Gen.choose(0L, 50L); seq <- Gen.choose(1L, 1000L)
    } yield (k, t, seq))
    lefts <- Gen.listOfN(nL, for {
      k <- Gen.choose(1, 8); t <- Gen.choose(0L, 50L)
    } yield (k, t))
  } yield (rights.distinctBy(_._3), lefts)

  test("as-of join == brute-force definition on random inputs") {
    for (seed <- 1 to 10) {
      val (rights, lefts) = gen(Gen.Parameters.default, Seed(seed.toLong)).get
      val leftDf = lefts.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
        .toDF("row_id", "key", "t")
      val rightDf = rights
        .map { case (k, t, seq) => (k, new java.sql.Timestamp(t * 1000), seq) }
        .toDF("key", "t", "seq")

      val got = AsOfJoin.asOf(leftDf, rightDf, "key", "key", "t", "t", "seq", Seq("seq"))
        .select("row_id", "asof_seq")
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

      val expected = lefts.zipWithIndex.map { case ((k, t), i) =>
        val cands = rights.filter(r => r._1 == k && r._2 <= t)
        i.toLong -> (if (cands.isEmpty) None
                     else Some(cands.maxBy(r => (r._2, r._3))._3))
      }.toMap

      assert(got == expected, s"seed=$seed: as-of join diverges from brute force")
    }
  }
}
