package graft.operators

import graft.QueryDef
import graft.QueryDef.t
import graft.dedup.Dedup

import org.apache.spark.sql.functions._

/** Deduplication queries over `documents` with DuckDB oracles that mirror
  * the md5-based hashing byte-for-byte (SURVEY.md §7.2 step 8 extensions).
  */
object DedupQueries {

  /** DuckDB: word-3-gram shingle list of `text` (multiset, doc order). */
  private val shinglesSql =
    "list_transform(range(0, len(string_split(text, ' ')) - 2), " +
      "i -> array_to_string((string_split(text, ' '))[i+1:i+3], ' '))"

  /** Mirrors graft.dedup.Dedup numeric minhash: one md5 per shingle, two
    * 60-bit hex halves, h1 + i·h2 mod 1e9+7, min per hash fn.
    */
  private def sigAggsSql(numHashes: Int): String =
    (0 until numHashes)
      .map(i => s"min((h1 + $i * h2) % ${graft.dedup.Dedup.MinhashMod}) AS m$i")
      .mkString(",\n          ")

  private def bandsSql(bands: Int, rows: Int): String =
    (0 until bands).map { b =>
      val elems = (0 until rows).map(r => s"m${b * rows + r}").mkString(", ")
      s"concat_ws('|', '$b', $elems)"
    }.mkString("[", ", ", "]")

  /** Shared candidate-pair CTE chain (MinHash 16 hashes, 8 bands × 2). */
  private val candidatesCte: String =
    s"""WITH sh AS (SELECT doc_id, unnest($shinglesSql) AS s FROM documents
       |            WHERE len(string_split(text, ' ')) >= 3),
       |hh AS (SELECT doc_id,
       |         CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % ${graft.dedup.Dedup.MinhashMod} AS h1,
       |         CAST(('0x' || substr(md5(s), 17, 15)) AS BIGINT) % ${graft.dedup.Dedup.MinhashMod} AS h2
       |       FROM sh),
       |sig AS (SELECT doc_id,
       |          ${sigAggsSql(16)}
       |        FROM hh GROUP BY doc_id),
       |bands AS (SELECT doc_id, unnest(${bandsSql(8, 2)}) AS band FROM sig),
       |cands AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
       |          FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: one hash aggregation (the 100 TB shape).
    QueryDef(
      "dedup_exact",
      (s, d) => Dedup.exact(t(s, d, "documents"), "text", "doc_id"),
      Some("""SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
             |  min(doc_id) AS keep_id, count(*) AS dup_count
             |FROM documents GROUP BY 1""".stripMargin)),

    // MinHash + LSH candidate generation (signature → band → bucket join).
    QueryDef(
      "dedup_minhash_candidates",
      (s, d) => Dedup.minhashCandidates(t(s, d, "documents"), "doc_id", "text",
        numHashes = 16, bands = 8),
      Some(s"""$candidatesCte
              |SELECT doc_id_a, doc_id_b FROM cands""".stripMargin)),

    // LSH candidates re-verified with exact n-gram Jaccard (the full
    // near-dup pipeline: sub-quadratic end to end).
    QueryDef(
      "dedup_minhash_verified",
      (s, d) => Dedup.nearDuplicates(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.2, numHashes = 16, bands = 8),
      Some(s"""$candidatesCte,
              |sets AS (SELECT doc_id, list_distinct($shinglesSql) AS sset FROM documents)
              |SELECT doc_id_a, doc_id_b,
              |  CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
              |    / CAST(len(list_distinct(list_concat(a.sset, b.sset))) AS DOUBLE) AS jaccard_sim
              |FROM cands JOIN sets a ON doc_id_a = a.doc_id
              |           JOIN sets b ON doc_id_b = b.doc_id
              |WHERE CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
              |    / CAST(len(list_distinct(list_concat(a.sset, b.sset))) AS DOUBLE) >= 0.2""".stripMargin),
      bench = true),

    // Brute-force n-gram Jaccard (recall baseline for the LSH path; kept
    // out of the sf0.1 bench set — quadratic by design).
    QueryDef(
      "dedup_jaccard_brute",
      (s, d) => Dedup.jaccardPairsBrute(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.2),
      Some(s"""WITH sets AS (SELECT doc_id, list_distinct($shinglesSql) AS sset FROM documents)
              |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
              |  CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
              |    / CAST(len(list_distinct(list_concat(a.sset, b.sset))) AS DOUBLE) AS jaccard_sim
              |FROM sets a JOIN sets b ON a.doc_id < b.doc_id
              |WHERE CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
              |    / CAST(len(list_distinct(list_concat(a.sset, b.sset))) AS DOUBLE) >= 0.2""".stripMargin),
      bench = false),

    // SimHash fingerprints (explode → md5 once per token → one
    // aggregation with 60 packed bit-votes).
    QueryDef(
      "dedup_simhash",
      (s, d) => Dedup.simhash(t(s, d, "documents"), "doc_id", "text"),
      Some {
        val votes = (0 until Dedup.SimhashBits).map { j =>
          s"sum((((CAST(strpos('0123456789abcdef', h[${j / 4 + 1}]) AS BIGINT) - 1) >> ${j % 4}) & 1) * 2 - 1) AS v$j"
        }.mkString(",\n    ")
        val packed = (0 until Dedup.SimhashBits).map { j =>
          s"(CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH tokh AS (
           |  SELECT doc_id, md5(tok) AS h
           |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
           |        FROM documents)),
           |voted AS (
           |  SELECT doc_id,
           |    $votes
           |  FROM tokh GROUP BY doc_id)
           |SELECT doc_id, CAST($packed AS BIGINT) AS simhash FROM voted""".stripMargin
      }))
}
