package graft.dedup

import graft.SparkSuite

import org.apache.spark.sql.functions._

/** CI pin of the containment join's LINEAR candidate-growth contract
  * (VERDICT r12 task #4): `dedup_containment_bounded`'s prefix filter +
  * size window must keep candidate volume proportional to corpus copies
  * when the copies are token-disjoint — PERF_NOTES r12 #7 measured
  * exactly 10.0× at the 10× lake, and this spec makes a regression to
  * superlinear growth (e.g. a dropped prefix restriction, which multiplies
  * candidates ~19× on this corpus) fail `sbt test` instead of waiting for
  * a bench round.
  *
  * Corpus construction mirrors [[graft.ScaleSmoke]]: copy 1 offsets
  * doc_id and Caesar-rotates the text, so copies share no tokens and the
  * true candidate count is exactly copies × the single-copy count.
  */
class ContainmentContractSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("containment candidate pairs grow linearly with token-disjoint copies") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val rotated = docs.select(
      (col("doc_id") + lit(100000000L)).as("doc_id"),
      translate(col("text"),
        "abcdefghijklmnopqrstuvwxyz", "bcdefghijklmnopqrstuvwxyza").as("text"))
    val one = graft.operators.DedupQueries
      .containmentBoundedCandidates(docs)._2.count()
    val two = graft.operators.DedupQueries
      .containmentBoundedCandidates(docs.union(rotated))._2.count()
    assert(one > 0, "vacuous contract: the single-copy corpus produced no candidates")
    // exact linearity is 2×; the ±5% band absorbs the rare cross-copy
    // token collision (a rotated word that IS an original word shifts two
    // global df values, which can nudge the per-doc rarity prefixes a few
    // pairs either way) without ever admitting a quadratic term — a
    // dropped prefix restriction multiplies candidates ~19× here
    assert(two <= (2 * one * 1.05).toLong,
      s"candidate growth is superlinear: $one pairs at 1 copy, $two at 2 " +
        "token-disjoint copies (linear bound = 2x) — the prefix/size/positional " +
        "pruning in containmentBoundedCandidates has regressed")
    assert(two >= (2 * one * 0.95).toLong,
      s"candidate count fell below additivity ($one -> $two): copies are " +
        "token-disjoint, so the 2-copy corpus must contain ~both copies' pairs — " +
        "the candidate generator is dropping pairs")
  }

  test("the prefix filter prunes the size-windowed token-join universe") {
    // The disjoint-copy test above pins additivity, but it CANNOT catch a
    // dropped prefix restriction: token-disjoint copies are additive for
    // any token-join generator, pruned or not. This is the test with
    // teeth — the candidate count must stay a small fraction of the
    // UNPRUNED universe (distinct size-windowed token-join pairs, the
    // volume a prefix-less generator would shuffle). Deliberately
    // widening prefA to the full token set moves the ratio to ~1.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val cands = graft.operators.DedupQueries
      .containmentBoundedCandidates(docs)._2.count()
    val toks = docs
      .filter(size(graft.text.TextOps.tokens(col("text"))) >= 3)
      .select(col("doc_id"), explode(
        graft.dedup.Dedup.shingleSet(col("text"), 3)).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("tid"))
    val szs = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val sized = toks.join(szs, "doc_id")
    val universe = sized.select(col("doc_id").as("ida"), col("tid"), col("sz").as("sza"))
      .join(sized.select(col("doc_id").as("idb"), col("tid"), col("sz").as("szb")), "tid")
      .filter(col("ida") =!= col("idb") &&
        col("szb") * 5 >= col("sza") * 4 && col("szb") <= col("sza") * 4)
      .select("ida", "idb").distinct().count()
    info(s"candidates=$cands universe=$universe ratio=${cands.toDouble / universe}")
    assert(universe > 0, "vacuous: empty token-join universe")
    // measured endpoints on this corpus: healthy pipeline 59/15840 =
    // 0.0037; BOTH prefixes deliberately opened to the full token set
    // 1301/15840 = 0.082 (the positional bound alone still prunes 92%).
    // 0.02 sits 5x above healthy and 4x below broken — a regression in
    // either prefix restriction crosses it, corpus-regeneration noise
    // does not.
    assert(cands.toDouble / universe <= 0.02,
      s"prefix filter is not pruning: $cands candidates vs $universe unpruned " +
        s"size-windowed pairs (ratio ${cands.toDouble / universe}, healthy ~0.004) " +
        "— a prefix-less generator would pass this volume to the verify stage " +
        "at every scale")
  }
}
