package graft.dedup

import graft.SparkSuite
import graft.similarity.Similarity

import org.apache.spark.sql.functions._

/** Semantic checks for the dedup/similarity extensions that the SQL oracle
  * can't express: LSH recall vs brute force, SimHash locality, ANN-vs-exact
  * overlap.
  */
class DedupSimSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("LSH candidates achieve full recall on high-similarity pairs here") {
    val brute = Dedup.jaccardPairsBrute(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture should contain at least one near-dup pair")
    val missed = brute -- cands
    assert(missed.isEmpty,
      s"LSH (16 hashes, 8 bands) missed high-sim pairs: $missed")
  }

  test("SimHash: near-dup docs collide within small hamming distance") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
    val pairs = Dedup.jaccardPairsBrute(docs, "doc_id", "text", threshold = 0.5)
    val joined = pairs
      .join(sh.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("simhash", "sh_a"), "doc_id_a")
      .join(sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("simhash", "sh_b"), "doc_id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
    val avgNearDup = joined.agg(avg("hamming")).head().getDouble(0)
    assert(avgNearDup < Dedup.SimhashBits / 2.0 - 5,
      s"near-dup pairs should have hamming well below random (~30): got $avgNearDup")
  }

  test("hamming multi-index finds EXACTLY the brute-force radius-3 pairs") {
    // the r13 100×-stress replaced 15-bit single-block keys (bucket space
    // saturates → quadratic pair expansion) with 24-bit block-pair keys;
    // this pins the pigeonhole contract the rewrite must preserve: recall
    // 1 at radius 3 (and no phantom pairs) vs an all-pairs bit_count scan
    val banded = graft.SparkEntry.queries("dedup_simhash_hamming")(spark, sf)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val fps = Dedup.simhash(docs, "doc_id", "text")
    val brute = fps.select(col("doc_id").as("doc_id_a"), col("simhash").as("fa"))
      .crossJoin(fps.select(col("doc_id").as("doc_id_b"), col("simhash").as("fb")))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .filter(bit_count(col("fa").bitwiseXOR(col("fb"))) <= 3)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(banded === brute,
      s"multi-index diverged from brute force: missed=${brute -- banded} phantom=${banded -- brute}")
  }

  test("exact dedup groups identical texts only") {
    val out = Dedup.exact(docs, "text", "doc_id")
    val n = docs.count()
    val totalCounted = out.agg(sum("dup_count")).head().getLong(0)
    assert(totalCounted == n, "every doc lands in exactly one group")
  }

  test("LSH-bucketed ANN returns a subset-consistent ranking vs brute force") {
    // 4 planes → 16 buckets over 500 near-orthogonal random vectors; finer
    // bucketing (8 planes/256 buckets) would leave most buckets singleton
    // and recall ~0 on this corpus. Real embedding corpora cluster, so
    // production defaults can be finer + multi-probe.
    val queries = embs.filter(col("id") < 5)
    val exact = Similarity.bruteForceTopK(embs, queries, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshBucketedTopK(embs, queries, k = 10, nPlanes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = if (exact.isEmpty) 1.0
      else (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.0, "bucketed ANN found none of the true neighbors")
    info(f"ANN recall@10 = $recall%.2f (4 hyperplanes, single probe)")

    // Hamming-1 multi-probe must not lose recall, and usually gains it
    val multi = Similarity.lshBucketedTopK(embs, queries, k = 10, nPlanes = 4, probes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val multiRecall = (exact intersect multi).size.toDouble / exact.size
    assert(multiRecall >= recall,
      f"multi-probe recall $multiRecall%.2f < single-probe $recall%.2f")
    info(f"ANN recall@10 = $multiRecall%.2f (4 hyperplanes, 4 probes)")
  }

  test("connected components: chains collapse transitively, singletons stay") {
    // diameter-4 chain exercises multi-round propagation; 60 is isolated
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 60L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val comp = Dedup.connectedComponents(nodes, "id", edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 60L -> 60L))
  }

  test("connected components agree with a driver-side union-find") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.2)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect()
    val got = Dedup.connectedComponents(docs, "doc_id",
        Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.2),
        "doc_id_a", "doc_id_b")
      .as[(Long, Long)].collect().toMap

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = docs.select("doc_id").as[Long].collect()
    val expected = ids.map { i =>
      val members = ids.filter(j => find(j) == find(i))
      i -> members.min
    }.toMap
    assert(got == expected)
    assert(pairs.nonEmpty, "fixture should exercise at least one merge")
  }

  test("PQ: codes are in range and ADC ranking tracks brute force") {
    val m = 4; val subDim = 16; val k = 10
    val cb = Similarity.pqCodebook(embs.filter(col("id") < 16), "id", "vec",
      m = m, subDim = subDim)
    assert(cb.count() == m * 16, "codebook: one entry per (subspace, seed)")

    val codes = Similarity.pqCodesWide(
      Similarity.pqAssign(Similarity.subvectors(embs, "id", "vec", m, subDim), cb, "id"),
      "id", m = m)
    assert(codes.count() == embs.count(), "one code row per vector")
    val outOfRange = codes.filter(
      (0 until m).map(i => col(s"c$i") < 0 || col(s"c$i") >= 16).reduce(_ || _)).count()
    assert(outOfRange == 0, "every code indexes the 16-entry codebook")

    // Seed vectors must encode to themselves (distance 0 to their own entry).
    val selfCodes = codes.filter(col("id") < 16)
      .filter((0 until m).map(i => col(s"c$i") === col("id").cast("int")).reduce(_ && _))
    assert(selfCodes.count() == 16, "each seed's nearest codeword is itself")

    // ADC is an approximation; demand better-than-random overlap with exact
    // top-k, not equality (500 corpus vectors, k=10 → random recall ≈ 2%).
    val queries = embs.filter(col("id") < 5)
    val qsubs = Similarity.subvectors(queries, "id", "vec", m, subDim)
      .withColumnRenamed("id", "query_id")
    val approx = Similarity.pqAdcTopK(codes, qsubs, cb, "id", "query_id",
      m = m, codebookK = 16, k = k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(approx.size == 5 * k, "k rows per query")
    val exact = Similarity.bruteForceTopK(embs, queries, k = k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.1, f"ADC recall@10 = $recall%.2f not above random (~0.02)")
    info(f"PQ ADC recall@10 = $recall%.2f (m=4, 16-entry codebooks)")
  }

  test("signBucket is deterministic across invocations") {
    val planes = Similarity.hyperplanes(8, 64)
    val b1 = embs.select(Similarity.signBucket(col("vec"), planes).as("b")).collect()
    val b2 = embs.select(Similarity.signBucket(col("vec"), planes).as("b")).collect()
    assert(b1.toSeq == b2.toSeq)
  }
}
