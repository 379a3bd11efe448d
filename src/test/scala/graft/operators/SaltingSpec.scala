package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSuite {
  import spark.implicits._

  test("salted join == plain join on skewed data (multiset equality)") {
    // one pathologically hot key (90% of rows) + a long tail
    val skewed = ((1 to 900).map(i => (1L, s"v$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"t$i"))).toDF("k", "payload")
    val dim = (1 to 50).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")

    val plain = skewed.join(dim, Seq("k"))
      .select("k", "payload", "attr").collect().map(_.toString).sorted
    val salted = Salting.saltedJoin(skewed, dim, Seq("k"), factor = 8)
      .select("k", "payload", "attr").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salt actually spreads the hot key across partitions") {
    val skewed = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val salt = pmod(xxhash64(col("k"), col("v")), lit(8L)).cast("int")
    val distinctSalts = skewed.select(salt.as("s")).distinct().count()
    assert(distinctSalts == 8, "content-derived salt must hit all buckets")
  }
}
