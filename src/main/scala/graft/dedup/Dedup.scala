package graft.dedup

import graft.text.TextOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every variant is expressed as hash → groupBy/join on the
  * hash — i.e. one shuffle keyed by a short digest, never an all-pairs
  * comparison. The only brute-force path ([[jaccardPairsBrute]]) exists as
  * the small-data oracle for the LSH candidate generator. Hashing uses md5
  * (engine-portable, seedable by prefixing) so the DuckDB oracle can verify
  * signatures byte-for-byte.
  */
object Dedup {

  /** Word n-gram shingles (multiset, in document order). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct shingle set — the Jaccard universe. */
  def shingleSet(text: Column, n: Int = 3): Column = array_distinct(shingles(text, n))

  /** Exact dedup: group identical normalized content, keep the smallest id.
    * One hash-partitioned aggregation — the 100 TB shape (32-byte keys, full
    * map-side partial aggregation).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextOps.fingerprintMd5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signature: `numHashes` simulated hash functions, each the
    * lexicographic min of md5("h:" + shingle). Returns an array<string>
    * column. Min over a multiset equals min over the set, so no distinct
    * pass is needed.
    *
    * NOTE: this is the single-expression form (handy for ad-hoc column
    * use); the pipeline path is [[minhashSignatures]], which computes each
    * md5 exactly once via explode + aggregation — Catalyst inlines
    * projections, so embedding this expression into several downstream
    * band digests would re-hash every shingle per digest.
    */
  def minhashSignature(text: Column, numHashes: Int, shingleN: Int = 3): Column = {
    val sh = shingles(text, shingleN)
    array((0 until numHashes).map { h =>
      array_min(transform(sh, s => md5(concat(lit(s"$h:"), s))))
    }: _*)
  }

  /** MinHash signatures as a DataFrame: (idCol, m0..m{numHashes-1}).
    * Shape: explode(shingles) → hash-partitioned min-aggregation — md5 is
    * computed once per (shingle, hash-fn), partials combine map-side, and
    * the shuffle carries only numHashes×32-byte digests per doc. Docs with
    * fewer than `shingleN` tokens have no shingles and are dropped (they
    * can never be LSH candidates).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int, shingleN: Int = 3): DataFrame = {
    val exploded = df
      .filter(size(TextOps.tokens(col(textCol))) >= shingleN)
      .select(col(idCol), explode(shingles(col(textCol), shingleN)).as("s"))
    val aggs = (0 until numHashes).map { h =>
      min(md5(concat(lit(s"$h:"), col("s")))).as(s"m$h")
    }
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band digests: signature rows grouped into `bands` bands of
    * `rows` hashes; the band index is hashed into the digest so a single
    * equality join on the digest implies (same band, same slice).
    */
  def lshBandDigests(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      val slice = (0 until rows).map(r => element_at(sig, b * rows + r + 1))
      md5(concat_ws("|", lit(b.toString) +: slice: _*))
    }: _*)

  /** MinHash/LSH candidate pairs: docs sharing ≥1 band digest.
    * Plan shape: project(signature) → explode(bands) → shuffle on digest →
    * self-equi-join → distinct pairs. No cross product anywhere; at 100 TB
    * the join keys are 32-byte digests with ~uniform distribution (AQE
    * splits any hot bucket).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 16, bands: Int = 8,
                        shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigDf = minhashSignatures(df, idCol, textCol, numHashes, shingleN)
    val sig = array((0 until numHashes).map(h => col(s"m$h")): _*)
    val banded = sigDf.select(
      col(idCol).as("doc"),
      explode(lshBandDigests(sig, bands, rows)).as("band"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_id_a"), col("b.doc").as("doc_id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity between two shingle-set columns. */
  def jaccard(sa: Column, sb: Column): Column =
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")

  /** LSH-verified near-duplicates: candidate pairs re-checked with exact
    * Jaccard ≥ threshold. The scale path: verification touches only
    * candidate pairs, not the quadratic universe.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double, numHashes: Int = 16, bands: Int = 8,
                     shingleN: Int = 3): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, numHashes, bands, shingleN)
    val sets = df.select(col(idCol).as("sid"), shingleSet(col(textCol), shingleN).as("sset"))
    cands
      .join(sets.withColumnRenamed("sid", "doc_id_a").withColumnRenamed("sset", "set_a"), "doc_id_a")
      .join(sets.withColumnRenamed("sid", "doc_id_b").withColumnRenamed("sset", "set_b"), "doc_id_b")
      .withColumn("jaccard_sim", jaccard(col("set_a"), col("set_b")))
      .filter(col("jaccard_sim") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard_sim")
  }

  /** Brute-force all-pairs Jaccard ≥ threshold — quadratic; small-data
    * oracle / recall baseline for [[nearDuplicates]] only.
    */
  def jaccardPairsBrute(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleN: Int = 3): DataFrame = {
    val sets = df.select(col(idCol).as("sid"), shingleSet(col(textCol), shingleN).as("sset"))
    val a = sets.select(col("sid").as("doc_id_a"), col("sset").as("set_a"))
    val b = sets.select(col("sid").as("doc_id_b"), col("sset").as("set_b"))
    a.crossJoin(b)
      .filter(col("doc_id_a") < col("doc_id_b"))
      .withColumn("jaccard_sim", jaccard(col("set_a"), col("set_b")))
      .filter(col("jaccard_sim") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard_sim")
  }

  /** Number of bits in [[simhash]] fingerprints (fits a positive Long). */
  val SimhashBits = 60

  /** SimHash fingerprint per document: majority vote over md5 bits of the
    * distinct tokens, packed into a 60-bit Long (ties vote 0). Computed via
    * explode + one hash-partitioned aggregation (the scale shape: md5 is
    * computed once per token, votes are map-side partially aggregated).
    * Input: (idCol, textCol); output: (idCol, simhash).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokenHash = df.select(
      col(idCol),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val votes = (0 until SimhashBits).map { j =>
      val nibble = conv(substring(col("h"), j / 4 + 1, 1), 16, 10).cast("long")
      sum(shiftright(nibble, j % 4).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as(s"v$j")
    }
    val voted = tokenHash.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val packed = (0 until SimhashBits).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select(col(idCol), packed.as("simhash"))
  }
}
