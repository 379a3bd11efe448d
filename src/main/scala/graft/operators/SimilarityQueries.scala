package graft.operators

import graft.QueryDef
import graft.QueryDef.t
import graft.similarity.Similarity

import org.apache.spark.sql.functions._

/** Similarity-search queries over `embeddings` (`array<float>`, dim 64).
  * DuckDB oracles mirror the sequential-fold double arithmetic exactly
  * (see [[graft.similarity.Similarity]] numeric policy).
  */
object SimilarityQueries {

  /** DuckDB exact dot product between list columns a and b (left fold in
    * DOUBLE — bit-identical to Spark's `aggregate` fold).
    */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  private def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  val defs: Seq[QueryDef] = Seq(

    // Brute-force exact top-k cosine neighbors for a small query set
    // (query side broadcast; corpus scanned once).
    QueryDef(
      "sim_topk_bruteforce",
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))
        Similarity.bruteForceTopK(emb, emb.filter(col("id") < 10), k = 5)
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
              |scored AS (
              |  SELECT query_id, c.vec_id AS neighbor_id,
              |         ${cosineSql("qvec", "c.embedding")} AS cosine_sim
              |  FROM embeddings c, q WHERE c.vec_id != query_id),
              |ranked AS (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |            ORDER BY cosine_sim DESC, neighbor_id) AS rank
              |  FROM scored)
              |SELECT query_id, neighbor_id, cosine_sim, rank
              |FROM ranked WHERE rank <= 5""".stripMargin)),

    // Embedding-space near-duplicate pairs (cosine ≥ 0.4 — the corpus'
    // pairwise max is ~0.51, so the threshold yields a non-trivial result;
    // brute force at oracle scale, the LSH-bucketed variant is the scale
    // path and is exercised in the test suite for recall).
    QueryDef(
      "sim_cosine_neardups",
      (s, d) => Similarity.cosineNearDupsBrute(
        t(s, d, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec")),
        threshold = 0.4),
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |  ${cosineSql("a.embedding", "b.embedding")} AS cosine_sim
              |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              |WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.4""".stripMargin),
      bench = false),

    // Per-label centroid-free stats: vector norms + label aggregation —
    // exercises HOF arithmetic inside a grouped aggregation.
    QueryDef(
      "sim_norm_stats",
      (s, d) => t(s, d, "embeddings")
        .select(col("label"), Similarity.l2Norm(col("embedding")).as("norm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
             sum(col("norm").cast("decimal(18,9)")).cast("double").as("sum_norm"))
        .orderBy("label"),
      Some(s"""SELECT label, count(*) AS n_vecs,
              |  CAST(sum(CAST(sqrt(${dotSql("embedding", "embedding")}) AS DECIMAL(18,9))) AS DOUBLE) AS sum_norm
              |FROM embeddings GROUP BY label ORDER BY label""".stripMargin)))
}
