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

  test("fully identical duplicate rows spread via the uniqueCol salt") {
    // 1000 byte-identical rows plus a unique ordinal: the content hash
    // alone would give all of them the same salt and the mitigation would
    // fail exactly in the duplicate-row skew case — the uniqueCol overload
    // exists for this
    val dupes = (1 to 1000).map(i => (1L, "same", i.toLong)).toDF("k", "payload", "ord")
    val dim = Seq((1L, "dim1")).toDF("k", "attr")
    val out = Salting.saltedJoin(dupes, dim, Seq("k"), factor = 8, uniqueCol = "ord")
    assert(out.count() == 1000, "join multiplicity preserved")
    // reconstruct the salt the join used and check the spread
    val salt = pmod(xxhash64(col("ord")), lit(8L)).cast("int")
    val spread = dupes.select(salt.as("s")).groupBy("s").count()
      .agg(max("count")).head.getLong(0)
    assert(spread < 500, s"identical rows must not all land in one salt bucket (max=$spread)")
  }

  test("salt expressions are deterministic (retry-safe at scale)") {
    // a nondeterministic salt (monotonically_increasing_id, rand) silently
    // duplicates/drops join rows when a fetch-failure recompute re-salts a
    // post-shuffle side — assert no nondeterministic expression anywhere in
    // either variant's plan
    val skewed = (1 to 100).map(i => (1L, s"v$i", i.toLong)).toDF("k", "payload", "ord")
    val dim = Seq((1L, "dim1")).toDF("k", "attr")
    for (plan <- Seq(
        Salting.saltedJoin(skewed, dim, Seq("k"), factor = 8),
        Salting.saltedJoin(skewed, dim, Seq("k"), factor = 8, uniqueCol = "ord"))) {
      val nondet = plan.queryExecution.analyzed.expressions
        .flatMap(_.collect { case e if !e.deterministic => e })
      assert(nondet.isEmpty, s"nondeterministic salt expressions: $nondet")
    }
  }
}
