package graft.operators

import graft.QueryDef
import graft.QueryDef.t
import graft.functions.GraftFunctions
import graft.text.TextOps

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation forensics and model-evaluation queries: exact duplicated
  * substring spans (the Lee et al. 2022 "Deduplicating Training Data Makes
  * Language Models Better" operator at shingle granularity), MOSS winnowing
  * fingerprints (Schleimer et al. 2003), a Count-Min sketch frequency audit
  * (Cormode & Muthukrishnan 2005), and the experiment/eval trio a/b z-test,
  * reliability (calibration) bins, and decile lift. All oracle-checked with
  * exact integer arithmetic up to a final division.
  *
  * Reference scope: the reference POC's analytics layer stops at SCD2 +
  * SQL rollups (duckdb/analytics/transform_scd2.py); these are the
  * training-data-pipeline extensions the build brief asks for beyond it.
  */
object CurationQueries {

  /** The fixed funnel pattern set shared by path_regex_funnel and its
    * streaming twin (streaming_path_funnel): name -> regex over the
    * `type>type>...` session path string.
    */
  private[operators] val funnelPatterns: Seq[(String, String)] = Seq(
    "signup_first" -> "^signup",
    "view_to_purchase" -> "view>.*purchase",
    "repeated_errors" -> "error>.*error",
    "ends_in_purchase" -> "purchase$")

  /** One-pass per-pattern match counts over a `path`-column DataFrame,
    * unpivoted to (pattern, n_sessions, n_match, match_rate) rows.
    */
  private[operators] def funnelMatches(
      paths: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sums = paths.agg(
      count(lit(1)).as("n_sessions"),
      funnelPatterns.map { case (nm, re) =>
        sum(when(col("path").rlike(re), 1L).otherwise(0L)).as(s"m_$nm")
      }: _*)
    val stackExpr = funnelPatterns.map { case (nm, _) => s"'$nm', m_$nm" }
      .mkString("stack(" + funnelPatterns.size + ", ", ", ", ") AS (pattern, n_match)")
    sums.select(col("n_sessions"), expr(stackExpr))
      .select(col("pattern"), col("n_sessions"), col("n_match"),
        (col("n_match").cast("double") / col("n_sessions").cast("double"))
          .as("match_rate"))
      .orderBy("pattern")
  }

  /** Per-user conversion flag: did the user's FIRST event (by ts,
    * event_id) land on `purchase`? "Any purchase ever" saturates to 1.0
    * as events-per-user grows with scale factor (every user eventually
    * purchases), which would make every downstream eval readout
    * vacuous; the first-event definition stays near the purchase share
    * of the event-type mix at any scale. Computed as an arg-min
    * aggregate (`min(struct(ts, event_id, event_type))`) — map-side
    * combinable, no per-user window, the 100 TB shape for "first row
    * per key".
    */
  private def firstEventConv(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "events")
      .groupBy("user_id")
      .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("fst"))
      .select(col("user_id"),
        when(col("fst.event_type") === "purchase", 1L).otherwise(0L).as("conv"))

  private val firstEventConvSql: String =
    """SELECT user_id,
      |     CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT) AS conv
      |   FROM (SELECT user_id, event_type,
      |           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |         FROM events) WHERE rn = 1""".stripMargin

  /** Shared "scored user" base for the eval trio: the first-event
    * conversion flag plus a deterministic synthetic model score in
    * [0, 1e6) that deliberately leaks 0.3 of signal from the label — a
    * hash-noise score would make every calibration/lift readout vacuously
    * flat. Integer permille units keep every aggregate exact until the
    * final division.
    */
  private def scoredUsers(s: org.apache.spark.sql.SparkSession, d: String) =
    firstEventConv(s, d)
      .withColumn("score_pm",
        PipelineQueries.hashPermille(col("user_id"), "score") % 700000L +
          col("conv") * 300000L)

  private val scoredUsersSql: String =
    s"""SELECT user_id, conv,
       |    (${PipelineQueries.hashSqlExpr("user_id", "score")}) % 700000
       |      + conv * 300000 AS score_pm
       |  FROM ($firstEventConvSql)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Exact duplicated-substring spans (Lee et al. 2022, "ExactSubstr"
    // at 8-token-shingle granularity): a shingle occurring in >= 2
    // distinct documents marks its 8-token span as duplicated text;
    // per document, overlapping/adjacent duplicated spans merge into
    // maximal islands (the gaps-and-islands window, threshold = shingle
    // width). This is the cross-doc boilerplate/copy detector that exact
    // whole-doc dedup misses. 100 TB shape: two shuffles keyed by
    // shingle (count-distinct + semi join back) and one per-doc window —
    // candidates are bounded by actual duplication, never all-pairs; the
    // suffix-array original is a single-node algorithm, this is its
    // distributed shingle-granular equivalent.
    QueryDef(
      "dup_span_extraction",
      (s, d) => {
        // 60-bit md5 shingle ids (the simjoin discipline, r12): both
        // shingle-keyed exchanges — the distinct-doc count and the semi
        // join back — move an 8-byte long instead of a ~50-byte 8-token
        // string; the id assignment replays exactly in DuckDB
        val sh = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(GraftFunctions.wordShingles(col("text"), 8)).as(Seq("pos", "shingle")))
          .select(col("doc_id"), col("pos"),
            conv(substring(md5(col("shingle")), 1, 15), 16, 10)
              .cast("long").as("tid"))
        val dup = sh.groupBy("tid")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select("tid")
        val pos = sh.join(dup, Seq("tid"), "left_semi")
          .select(col("doc_id"), col("pos").cast("long").as("pos"))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val isl = pos
          .withColumn("f",
            when(col("pos") - lag("pos", 1).over(w) <= 8L, 0L).otherwise(1L))
          .withColumn("island", sum("f").over(w))
        isl.groupBy("doc_id", "island")
          .agg(min("pos").as("st"), (max("pos") + 7L).as("en"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_dup_spans"),
            sum(col("en") - col("st") + 1L).as("dup_tokens"),
            max(col("en") - col("st") + 1L).as("max_span_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |sh AS (
             |  SELECT doc_id, pos,
             |    CAST(('0x' || substr(md5(array_to_string(tk[pos+1:pos+8], ' ')), 1, 15))
             |      AS BIGINT) AS tid
             |  FROM (SELECT doc_id, tk, unnest(range(len(tk) - 7)) AS pos
             |        FROM toks WHERE len(tk) >= 8)),
             |dup AS (SELECT tid FROM sh GROUP BY tid
             |        HAVING count(DISTINCT doc_id) >= 2),
             |p AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos FROM sh
             |      WHERE tid IN (SELECT tid FROM dup)),
             |fl AS (SELECT doc_id, pos,
             |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
             |              THEN 0 ELSE 1 END AS f
             |       FROM p),
             |isl AS (SELECT doc_id, pos,
             |          sum(f) OVER (PARTITION BY doc_id ORDER BY pos) AS island
             |        FROM fl),
             |spans AS (SELECT doc_id, island, min(pos) AS st, max(pos) + 7 AS en
             |          FROM isl GROUP BY doc_id, island)
             |SELECT doc_id, count(*) AS n_dup_spans,
             |  CAST(sum(en - st + 1) AS BIGINT) AS dup_tokens,
             |  CAST(max(en - st + 1) AS BIGINT) AS max_span_tokens
             |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
    // the MOSS plagiarism-detector scheme): hash every 4-token shingle,
    // slide a window of 4 hashes, keep the window minimum (ties to the
    // RIGHTMOST position, the paper's rule), dedupe selected positions.
    // Guarantees: at least one fingerprint per w consecutive hashes and
    // any shared run of >= k+w-1 tokens shares a fingerprint — position-
    // robust, unlike fixed-stride sampling. The tie rule is encoded
    // arithmetically: minimize key = h*1e6 + (999999-pos), so equal
    // hashes prefer larger pos. Per-row hashing + a bounded ROWS frame
    // window per doc — no shuffle beyond the doc_id partition; selection
    // density ~2/(w+1) bounds downstream index size at 100 TB.
    QueryDef(
      "winnowing_fingerprints",
      (s, d) => {
        val sh = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(GraftFunctions.wordShingles(col("text"), 4)).as(Seq("pos", "shingle")))
        val wAll = Window.partitionBy("doc_id")
        val wFrame = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
        sh.withColumn("key",
            PipelineQueries.hashPermille(col("shingle"), "win") * 1000000L +
              (lit(999999L) - col("pos")))
          .withColumn("cnt", count(lit(1)).over(wAll))
          .withColumn("wmin", min("key").over(wFrame))
          .filter(col("pos") <= col("cnt") - 4)
          .select(col("doc_id"), (lit(999999L) - col("wmin") % 1000000L).as("sel_pos"),
            col("cnt"))
          .distinct()
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_fingerprints"), (max("cnt") - 3L).as("n_windows"))
          .withColumn("density",
            col("n_fingerprints").cast("double") / col("n_windows").cast("double"))
          .orderBy("doc_id")
      },
      Some(s"""WITH sh AS (
             |  SELECT doc_id, pos, array_to_string(tk[pos+1:pos+4], ' ') AS shingle
             |  FROM (SELECT doc_id, tk, unnest(range(len(tk) - 3)) AS pos
             |        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
             |        WHERE len(tk) >= 4)),
             |k AS (
             |  SELECT doc_id, pos,
             |    (${PipelineQueries.hashSqlExpr("shingle", "win")}) * 1000000 + (999999 - pos) AS key,
             |    count(*) OVER (PARTITION BY doc_id) AS cnt
             |  FROM sh),
             |m AS (
             |  SELECT doc_id, pos, cnt,
             |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
             |                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
             |  FROM k),
             |sel AS (
             |  SELECT DISTINCT doc_id, 999999 - (wmin % 1000000) AS sel_pos, cnt
             |  FROM m WHERE pos <= cnt - 4)
             |SELECT doc_id, count(*) AS n_fingerprints,
             |  CAST(max(cnt) - 3 AS BIGINT) AS n_windows,
             |  CAST(count(*) AS DOUBLE) / CAST(max(cnt) - 3 AS DOUBLE) AS density
             |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Count-Min sketch frequency audit (Cormode & Muthukrishnan 2005):
    // d=4 hash rows x width 256 counters, estimate = min over rows, with
    // the CMS one-sided guarantee est >= exact surfaced as `overcount`
    // for the corpus's top-20 tokens. Built DECLARATIVELY from the
    // per-token exact counts (groupBy tok first, then expand 4 hash
    // rows over the distinct-token aggregate) — map-side combine
    // happens on the raw token stream once, and the 4x expansion only
    // touches O(vocab) rows. The 1024-cell counter table is a mergeable
    // fixed-size sketch: at 100 TB each executor's partial is the same
    // 1024 cells, the reduce is cellwise sum, and the probe side is a
    // broadcast of the 20 queried tokens.
    QueryDef(
      "cms_frequency_audit",
      (s, d) => {
        val tc = t(s, d, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("n"))
        val withJ = tc.select(col("tok"), col("n"),
            explode(sequence(lit(0), lit(3))).as("j"))
          .withColumn("bucket",
            conv(substring(md5(concat(lit("cms"), col("j").cast("string"),
              lit(":"), col("tok"))), 1, 15), 16, 10).cast("long") % 256L)
        val counters = withJ.groupBy("j", "bucket").agg(sum("n").as("c"))
        val topk = tc.orderBy(col("n").desc, col("tok")).limit(20)
          .withColumnRenamed("n", "n_exact")
        topk
          .select(col("tok"), col("n_exact"), explode(sequence(lit(0), lit(3))).as("j"))
          .withColumn("bucket",
            conv(substring(md5(concat(lit("cms"), col("j").cast("string"),
              lit(":"), col("tok"))), 1, 15), 16, 10).cast("long") % 256L)
          .join(broadcast(counters), Seq("j", "bucket"))
          .groupBy("tok", "n_exact")
          .agg(min("c").as("n_est"))
          .withColumn("overcount", col("n_est") - col("n_exact"))
          .orderBy(col("n_exact").desc, col("tok"))
      },
      Some("""WITH tc AS (
             |  SELECT tok, count(*) AS n
             |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
             |  GROUP BY tok),
             |cells AS (
             |  SELECT j,
             |    CAST(('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 256 AS bucket,
             |    n
             |  FROM (SELECT tok, n, unnest(range(0, 4)) AS j FROM tc)),
             |counters AS (
             |  SELECT j, bucket, CAST(sum(n) AS BIGINT) AS c
             |  FROM cells GROUP BY j, bucket),
             |topk AS (
             |  SELECT tok, CAST(n AS BIGINT) AS n_exact
             |  FROM tc ORDER BY n DESC, tok LIMIT 20),
             |probe AS (
             |  SELECT tok, n_exact, j,
             |    CAST(('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':' || tok), 1, 15)) AS BIGINT) % 256 AS bucket
             |  FROM (SELECT tok, n_exact, unnest(range(0, 4)) AS j FROM topk))
             |SELECT p.tok, p.n_exact, min(c.c) AS n_est,
             |  min(c.c) - p.n_exact AS overcount
             |FROM probe p JOIN counters c ON c.j = p.j AND c.bucket = p.bucket
             |GROUP BY p.tok, p.n_exact
             |ORDER BY p.n_exact DESC, p.tok""".stripMargin)),

    // Two-proportion z-test over a deterministic hash-split A/B
    // assignment: per-variant user counts + purchase conversions, pooled
    // standard error, one z statistic. The experiment-analysis readout a
    // monitoring stack runs per flag flip. Integer counts to the end;
    // the z arithmetic is written with the identical operation order on
    // both engines (each IEEE op is correctly rounded, so matching
    // shapes give matching bits). Scale: one groupBy(user) + one
    // 2-group aggregate — no joins, no windows.
    QueryDef(
      "abtest_two_proportion_z",
      (s, d) => {
        val u = firstEventConv(s, d)
          .withColumn("variant", PipelineQueries.hashPermille(col("user_id"), "ab") % 2L)
        val agg = u.groupBy()
          .agg(sum(when(col("variant") === 0L, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("variant") === 0L, col("conv")).otherwise(0L)).as("conv_a"),
            sum(when(col("variant") === 1L, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("variant") === 1L, col("conv")).otherwise(0L)).as("conv_b"))
        val pa = col("conv_a").cast("double") / col("n_a").cast("double")
        val pb = col("conv_b").cast("double") / col("n_b").cast("double")
        val pp = (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double")
        agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          pa.as("rate_a"), pb.as("rate_b"),
          ((pa - pb) /
            sqrt(pp * (lit(1.0) - pp) *
              (lit(1.0) / col("n_a").cast("double") +
               lit(1.0) / col("n_b").cast("double")))).as("z_score"))
      },
      Some {
        val h = PipelineQueries.hashSqlExpr("user_id", "ab")
        s"""WITH u AS (
           |  SELECT user_id, conv, ($h) % 2 AS variant
           |  FROM ($firstEventConvSql)),
           |a AS (
           |  SELECT
           |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
           |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
           |  FROM u)
           |SELECT n_a, conv_a, n_b, conv_b,
           |  CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
           |  CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
           |  (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           |   - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           |  / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
           |         * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
           |         * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS z_score
           |FROM a""".stripMargin
      }),

    // Reliability (calibration) bins: decile-of-score buckets comparing
    // mean predicted probability against empirical conversion rate — the
    // reliability-diagram table behind ECE. Scores are integer permille
    // units so the per-bin sums are exact; two divisions at the end.
    // Scale: groupBy(user) then a 10-group aggregate — nothing global.
    QueryDef(
      "calibration_reliability_bins",
      (s, d) => scoredUsers(s, d)
        .withColumn("bin", expr("score_pm div 100000"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_users"),
          sum("conv").as("n_conv"),
          sum("score_pm").as("sum_pm"))
        .select(col("bin"), col("n_users"), col("n_conv"),
          (col("sum_pm").cast("double") /
            (col("n_users").cast("double") * 1000000.0)).as("mean_score"),
          (col("n_conv").cast("double") / col("n_users").cast("double")).as("emp_rate"))
        .orderBy("bin"),
      Some(s"""WITH u AS ($scoredUsersSql)
             |SELECT score_pm // 100000 AS bin, count(*) AS n_users,
             |  CAST(sum(conv) AS BIGINT) AS n_conv,
             |  CAST(sum(score_pm) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean_score,
             |  CAST(sum(conv) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS emp_rate
             |FROM u GROUP BY 1 ORDER BY bin""".stripMargin)),

    // Decile lift/gains table: rank users by model score, split into 10
    // exact deciles, report per-decile conversion, capture rate, and
    // lift vs the base rate — the targeting-model readout. The global
    // rank is computed SCALABLY: scores are aggregated per distinct
    // value (<= 1e6 groups) so the unpartitioned running-total window
    // touches only the bounded score-histogram, and each user's rank is
    // that offset plus a row_number PARTITIONED by score — no
    // single-task window over the full user table at any scale. The
    // DuckDB oracle uses the naive global ROW_NUMBER, proving the
    // decomposition exact.
    QueryDef(
      "decile_lift_table",
      (s, d) => {
        val u = scoredUsers(s, d)
        val hist = u.groupBy("score_pm").agg(count(lit(1)).as("nscore"))
        val wRun = Window.orderBy(col("score_pm").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = hist.withColumn("base", coalesce(sum("nscore").over(wRun), lit(0L)))
        val wIn = Window.partitionBy("score_pm").orderBy("user_id")
        val ranked = u.join(offs.select("score_pm", "base"), Seq("score_pm"))
          .withColumn("rn", col("base") + row_number().over(wIn))
        val tot = u.groupBy().agg(count(lit(1)).as("n_total"), sum("conv").as("conv_total"))
        val dec = ranked.join(broadcast(tot))
          .withColumn("decile", expr("((rn - 1) * 10) div n_total"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"),
            max("n_total").as("n_total"), max("conv_total").as("conv_total"))
        val wCum = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dec
          .withColumn("cum_conv", sum("n_conv").over(wCum))
          .select(col("decile"), col("n_users"), col("n_conv"),
            (col("n_conv").cast("double") / col("n_users").cast("double")).as("conv_rate"),
            (col("cum_conv").cast("double") / col("conv_total").cast("double")).as("cum_capture"),
            ((col("n_conv").cast("double") / col("n_users").cast("double")) /
              (col("conv_total").cast("double") / col("n_total").cast("double"))).as("lift"))
          .orderBy("decile")
      },
      Some(s"""WITH u AS ($scoredUsersSql),
             |ranked AS (
             |  SELECT user_id, conv,
             |    ROW_NUMBER() OVER (ORDER BY score_pm DESC, user_id) AS rn,
             |    count(*) OVER () AS n_total,
             |    CAST(sum(conv) OVER () AS BIGINT) AS conv_total
             |  FROM u),
             |dec AS (
             |  SELECT ((rn - 1) * 10) // n_total AS decile,
             |    count(*) AS n_users, CAST(sum(conv) AS BIGINT) AS n_conv,
             |    max(n_total) AS n_total, max(conv_total) AS conv_total
             |  FROM ranked GROUP BY 1)
             |SELECT decile, n_users, n_conv,
             |  CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_rate,
             |  CAST(sum(n_conv) OVER (ORDER BY decile
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             |    / CAST(conv_total AS DOUBLE) AS cum_capture,
             |  (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
             |    / (CAST(conv_total AS DOUBLE) / CAST(n_total AS DOUBLE)) AS lift
             |FROM dec ORDER BY decile""".stripMargin)),

    // Pointwise/aggregate mutual information between the `lang` and
    // `source` facets of the corpus — the mix-design diagnostic that
    // says HOW MUCH the language mix depends on the source (MI = 0:
    // sources are language-balanced; high MI: languages are siloed per
    // source, and per-source sampling quotas will skew the language
    // mix). Complements source_mix_entropy (marginal) with the joint.
    // Per-cell rows carry the PMI and the MI contribution; every count
    // is exact BIGINT (cell*N and marginal products stay < 2^53), and
    // both log-bearing outputs are QUANTIZED to nano-units
    // (round(term·1e9) as BIGINT, the doc_unigram_surprisal pattern —
    // ln's last bit differs between the JDK and libm).
    // One groupBy(lang, source) + two tiny broadcast marginals.
    QueryDef(
      "lang_source_mutual_info",
      (s, d) => {
        val cells = t(s, d, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("n"))
        val wAll = Window.partitionBy(lit(1))
        val wL = Window.partitionBy("lang")
        val wS = Window.partitionBy("source")
        val ratio = (col("n") * col("n_tot")).cast("double") /
          (col("n_lang") * col("n_src")).cast("double")
        cells
          .withColumn("n_tot", sum("n").over(wAll))
          .withColumn("n_lang", sum("n").over(wL))
          .withColumn("n_src", sum("n").over(wS))
          .select(col("lang"), col("source"), col("n"),
            round(log(ratio) * lit(1e9)).cast("long").as("pmi_nano"),
            round((col("n").cast("double") / col("n_tot").cast("double")) *
              log(ratio) * lit(1e9)).cast("long").as("mi_term_nano"))
          .orderBy("lang", "source")
      },
      Some("""WITH cells AS (
             |  SELECT lang, source, count(*) AS n
             |  FROM documents GROUP BY lang, source),
             |m AS (
             |  SELECT lang, source, n,
             |    CAST(sum(n) OVER () AS BIGINT) AS n_tot,
             |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
             |    CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS n_src
             |  FROM cells)
             |SELECT lang, source, n,
             |  CAST(round(ln(CAST(n * n_tot AS DOUBLE) / CAST(n_lang * n_src AS DOUBLE))
             |    * 1e9) AS BIGINT) AS pmi_nano,
             |  CAST(round((CAST(n AS DOUBLE) / CAST(n_tot AS DOUBLE))
             |    * ln(CAST(n * n_tot AS DOUBLE) / CAST(n_lang * n_src AS DOUBLE))
             |    * 1e9) AS BIGINT) AS mi_term_nano
             |FROM m ORDER BY lang, source""".stripMargin)),

    // Bigram language-model perplexity of a held-out split under an
    // add-1-smoothed LM trained on the other 80% (deterministic hash
    // split) — the classic intrinsic data-quality scorer (CCNet/KenLM
    // style): a corpus slice whose held-out perplexity spikes is
    // distributionally alien to the rest. Counts are exact integers;
    // each bigram's log-probability is quantized to nano-units BEFORE
    // the weighted sum (the surprisal pattern), so the corpus aggregate
    // is integer arithmetic and the one exp() at the end consumes an
    // identical double on both engines. Scale shape: unigram/bigram
    // count tables shuffle by token (linear in distinct n-grams), the
    // held-out side joins GROUPED by bigram (one row per distinct
    // bigram, not per occurrence), vocab size broadcasts. The nano sum
    // holds to ~1e18 ≈ 10^8 held-out bigrams per final task — beyond
    // that, route the sum through DECIMAL(38,0).
    QueryDef(
      "lm_bigram_perplexity",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
          .withColumn("is_train",
            PipelineQueries.hashPermille(col("doc_id"), "lm") < 800000L)
        val trainToks = docs.filter(col("is_train"))
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
        val vocab = trainToks.agg(countDistinct(col("tok")).as("v"))
        val uni = trainToks.groupBy("tok").agg(count(lit(1)).as("c1"))
          .withColumnRenamed("tok", "w1")
        val bg = docs.filter(col("is_train"))
          .select(explode(GraftFunctions.wordShingles(col("text"), 2)).as("bg"))
          .groupBy("bg").agg(count(lit(1)).as("c12"))
        val ho = docs.filter(!col("is_train"))
          .select(explode(GraftFunctions.wordShingles(col("text"), 2)).as("bg"))
          .groupBy("bg").agg(count(lit(1)).as("m"))
          .withColumn("w1", substring_index(col("bg"), " ", 1))
        val lpNano = round(log(
            (coalesce(col("c12"), lit(0L)) + 1L).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * lit(1e9))
          .cast("long")
        val agg = ho.join(bg, Seq("bg"), "left_outer")
          .join(uni, Seq("w1"), "left_outer")
          .crossJoin(broadcast(vocab))
          .select(col("m"), col("v"), lpNano.as("lp_nano"))
          .agg(max(col("v")).as("vocab_size"),
            sum(col("m")).as("n_heldout_bigrams"),
            (-sum(col("m") * col("lp_nano"))).as("xent_sum_nano"))
        agg.select(col("vocab_size"), col("n_heldout_bigrams"), col("xent_sum_nano"),
          round(exp((col("xent_sum_nano").cast("double") /
            col("n_heldout_bigrams").cast("double")) / lit(1e9)) * lit(1e6))
            .cast("long").as("ppl_micro"))
      },
      Some {
        val h = PipelineQueries.hashSqlExpr("doc_id", "lm")
        val bigrams = "list_transform(range(0, len(string_split(text, ' ')) - 1), " +
          "i -> array_to_string((string_split(text, ' '))[i+1:i+2], ' '))"
        s"""WITH docs AS (
           |  SELECT doc_id, text, ($h) < 800000 AS is_train FROM documents),
           |tr_tok AS (
           |  SELECT unnest(string_split(text, ' ')) AS tok FROM docs WHERE is_train),
           |vocab AS (SELECT count(DISTINCT tok) AS v FROM tr_tok),
           |uni AS (SELECT tok, count(*) AS c1 FROM tr_tok GROUP BY tok),
           |tr_bg AS (
           |  SELECT bg, count(*) AS c12
           |  FROM (SELECT unnest($bigrams) AS bg FROM docs WHERE is_train)
           |  GROUP BY bg),
           |ho AS (
           |  SELECT bg, count(*) AS m
           |  FROM (SELECT unnest($bigrams) AS bg FROM docs WHERE NOT is_train)
           |  GROUP BY bg),
           |j AS (
           |  SELECT ho.m,
           |    CAST(round(ln(CAST(coalesce(c12, 0) + 1 AS DOUBLE)
           |        / CAST(coalesce(c1, 0) + v AS DOUBLE)) * 1e9) AS BIGINT) AS lp_nano
           |  FROM ho
           |  LEFT JOIN tr_bg ON tr_bg.bg = ho.bg
           |  LEFT JOIN uni ON uni.tok = split_part(ho.bg, ' ', 1)
           |  CROSS JOIN vocab)
           |SELECT (SELECT v FROM vocab) AS vocab_size,
           |  CAST(sum(m) AS BIGINT) AS n_heldout_bigrams,
           |  CAST(-sum(m * lp_nano) AS BIGINT) AS xent_sum_nano,
           |  CAST(round(exp((CAST(-sum(m * lp_nano) AS DOUBLE)
           |      / CAST(sum(m) AS DOUBLE)) / 1e9) * 1e6) AS BIGINT) AS ppl_micro
           |FROM j""".stripMargin
      }),

    // Distinct-n diversity per source (distinct 3-grams / total
    // 3-grams) — the repetitiveness card generative-eval suites report
    // as distinct-n: a source whose ratio collapses is template spam
    // even when exact dedup passes. Same distinct-shingle cardinality
    // class as corpus_dup_ngram_frac, sliced per source; both counts
    // ride one two-level aggregate keyed by (source, shingle).
    QueryDef(
      "distinct_ngram_diversity",
      (s, d) => t(s, d, "documents")
        .select(col("source"),
          explode(GraftFunctions.wordShingles(col("text"), 3)).as("s3"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          countDistinct(col("s3")).as("n_distinct"))
        .withColumn("diversity",
          col("n_distinct").cast("double") / col("n_total").cast("double"))
        .orderBy("source"),
      Some(s"""SELECT source, count(*) AS n_total,
             |  count(DISTINCT s3) AS n_distinct,
             |  CAST(count(DISTINCT s3) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS diversity
             |FROM (SELECT source, unnest(${DedupQueries.shinglesSql}) AS s3
             |      FROM documents WHERE len(string_split(text, ' ')) >= 3)
             |GROUP BY source ORDER BY source""".stripMargin)),

    // Regex funnels over sessionized event paths: each (user, 30-min
    // session) becomes an ordered `type>type>...` path string, and a
    // fixed pattern set is evaluated as anchored/unanchored regexes —
    // the product-analytics "path matches" readout (did the session
    // view-then-purchase? start at signup? hit repeated errors?).
    // One sessionize window (the events_sessionize rule verbatim), one
    // per-session sort-free path build (array_sort over the collected
    // struct, not a second window), then a single pass computes every
    // pattern's match count; stack() unpivots to one row per pattern.
    QueryDef(
      "path_regex_funnel",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val prevTs = lag(col("ts"), 1).over(byUser)
        val isNew = when(prevTs.isNull ||
          (unix_millis(col("ts").cast("timestamp")) -
           unix_millis(prevTs.cast("timestamp"))) > 1800000L, 1L).otherwise(0L)
        val paths = t(s, d, "events")
          .withColumn("session_seq", sum(isNew).over(run))
          .groupBy("user_id", "session_seq")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))), x => x.getField("event_type")), ">").as("path"))
        funnelMatches(paths)
      },
      Some("""WITH se AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |sess AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    SUM(CASE WHEN prev_ts IS NULL
             |         OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
             |  FROM se),
             |paths AS (
             |  SELECT user_id, session_seq,
             |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
             |  FROM sess GROUP BY user_id, session_seq),
             |m AS (
             |  SELECT count(*) AS n_sessions,
             |    CAST(sum(CASE WHEN regexp_matches(path, '^signup') THEN 1 ELSE 0 END) AS BIGINT) AS m_signup_first,
             |    CAST(sum(CASE WHEN regexp_matches(path, 'view>.*purchase') THEN 1 ELSE 0 END) AS BIGINT) AS m_view_to_purchase,
             |    CAST(sum(CASE WHEN regexp_matches(path, 'error>.*error') THEN 1 ELSE 0 END) AS BIGINT) AS m_repeated_errors,
             |    CAST(sum(CASE WHEN regexp_matches(path, 'purchase$') THEN 1 ELSE 0 END) AS BIGINT) AS m_ends_in_purchase
             |  FROM paths)
             |SELECT p.pattern, m.n_sessions, p.n_match,
             |  CAST(p.n_match AS DOUBLE) / CAST(m.n_sessions AS DOUBLE) AS match_rate
             |FROM m, (
             |  SELECT 'signup_first' AS pattern, m_signup_first AS n_match FROM m
             |  UNION ALL SELECT 'view_to_purchase', m_view_to_purchase FROM m
             |  UNION ALL SELECT 'repeated_errors', m_repeated_errors FROM m
             |  UNION ALL SELECT 'ends_in_purchase', m_ends_in_purchase FROM m) p
             |ORDER BY p.pattern""".stripMargin)),

    // k-anonymity audit over the corpus's quasi-identifier tuple
    // (lang, source, n_chars bucketed to 100): the privacy readout a
    // release gate runs before publishing a dataset card — the minimum
    // equivalence-class size IS the dataset's k, and the rows sitting
    // in classes below the k=5 policy line are the re-identification
    // surface. One groupBy + one global aggregate; every count exact.
    QueryDef(
      "k_anonymity_audit",
      (s, d) => t(s, d, "documents")
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 100").as("size_bucket"))
        .agg(count(lit(1)).as("cls"))
        .agg(min(col("cls")).as("k_min"),
          count(lit(1)).as("n_classes"),
          sum(when(col("cls") < 5L, 1L).otherwise(0L)).as("n_classes_lt5"),
          sum(when(col("cls") < 5L, col("cls")).otherwise(0L)).as("n_docs_at_risk")),
      Some("""WITH cls AS (
             |  SELECT lang, source, n_chars // 100 AS size_bucket, count(*) AS cls
             |  FROM documents GROUP BY 1, 2, 3)
             |SELECT CAST(min(cls) AS BIGINT) AS k_min,
             |  count(*) AS n_classes,
             |  CAST(sum(CASE WHEN cls < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_classes_lt5,
             |  CAST(sum(CASE WHEN cls < 5 THEN cls ELSE 0 END) AS BIGINT) AS n_docs_at_risk
             |FROM cls""".stripMargin)),

    // l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    // necessary companion: a k-anonymous class whose SENSITIVE
    // attribute (here `lang`) is uniform still leaks it (the
    // homogeneity attack), so each quasi-identifier class
    // (source × size bucket) must also carry ≥ l distinct sensitive
    // values. Reports the corpus-wide minimum l, the classes below
    // l=3, and the rows they expose. Same two stacked aggregates as
    // k_anonymity_audit — the distinct-count runs inside the first
    // groupBy, nothing rescans.
    QueryDef(
      "l_diversity_audit",
      (s, d) => t(s, d, "documents")
        .groupBy(col("source"), expr("n_chars div 100").as("size_bucket"))
        .agg(count(lit(1)).as("cls"), countDistinct(col("lang")).as("ldiv"))
        .agg(min(col("ldiv")).as("l_min"),
          count(lit(1)).as("n_classes"),
          sum(when(col("ldiv") < 3L, 1L).otherwise(0L)).as("n_classes_lt3"),
          sum(when(col("ldiv") < 3L, col("cls")).otherwise(0L)).as("n_docs_at_risk")),
      Some("""WITH cls AS (
             |  SELECT source, n_chars // 100 AS size_bucket, count(*) AS cls,
             |    count(DISTINCT lang) AS ldiv
             |  FROM documents GROUP BY 1, 2)
             |SELECT CAST(min(ldiv) AS BIGINT) AS l_min,
             |  count(*) AS n_classes,
             |  CAST(sum(CASE WHEN ldiv < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_classes_lt3,
             |  CAST(sum(CASE WHEN ldiv < 3 THEN cls ELSE 0 END) AS BIGINT) AS n_docs_at_risk
             |FROM cls""".stripMargin)),

    // t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    // third rung of the privacy ladder after k_anonymity_audit and
    // l_diversity_audit: a diverse class can still leak when its
    // SENSITIVE-attribute distribution (lang) differs sharply from the
    // corpus-wide distribution (the skewness attack l-diversity misses).
    // For an unordered attribute the Earth Mover's Distance reduces to
    // total variation, computed here as EXACT cross-multiplied integers:
    // per class, t_num = Σ_lang |cnt_cls·N_tot − cnt_tot·N_cls| and
    // t_den = 2·N_cls·N_tot, so t = t_num/t_den in one final division.
    // The zero-count langs a class is MISSING contribute through the
    // grid join (absent langs still shift mass). Two bounded aggregates
    // plus a (classes × langs) grid — |langs| is domain-bounded, nothing
    // rescans at any corpus size.
    QueryDef(
      "t_closeness_audit",
      (s, d) => {
        val docs = t(s, d, "documents")
        val cls = docs.groupBy(col("source"), expr("n_chars div 100").as("size_bucket"))
          .agg(count(lit(1)).as("n_cls"))
        val cl = docs.groupBy(col("source"), expr("n_chars div 100").as("size_bucket"),
            col("lang"))
          .agg(count(lit(1)).as("cnt_cls"))
        val gl = broadcast(docs.groupBy("lang").agg(count(lit(1)).as("cnt_tot")))
        val nTot = broadcast(docs.groupBy().agg(count(lit(1)).as("n_tot")))
        val grid = cls.crossJoin(gl).join(nTot)
          .join(cl, Seq("source", "size_bucket", "lang"), "left_outer")
          .withColumn("cnt_cls", coalesce(col("cnt_cls"), lit(0L)))
        // cross-multiplied terms ride DECIMAL(38,0): cnt·N_tot products
        // exceed 2^63 once N_tot is a 100 TB corpus doc count (the
        // HUGEINT-guard class, r9 ADVICE) — DuckDB promotes silently,
        // Spark under ANSI must go decimal. The decimal stays INTERNAL:
        // wider-than-int64 decimal must never reach an output column
        // (the driver hasher distinguishes int128-backed decimals from
        // DuckDB HUGEINT even when values match — this exact query was
        // the only r10 red), so t_num/t_den leave as DOUBLE, mirroring
        // drift_emd_wasserstein / anti-entropy digests.
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        grid
          .groupBy("source", "size_bucket")
          .agg(max(col("n_cls")).as("n_rows"),
            sum(abs(col("cnt_cls").cast(d38) * col("n_tot") -
              col("cnt_tot").cast(d38) * col("n_cls"))).as("t_num_d"),
            (max(col("n_cls")).cast(d38) * max(col("n_tot")) * lit(2L)).as("t_den_d"))
          .withColumn("t_num", col("t_num_d").cast("double"))
          .withColumn("t_den", col("t_den_d").cast("double"))
          .withColumn("t_closeness", col("t_num") / col("t_den"))
          .drop("t_num_d", "t_den_d")
          .select(col("source"), col("size_bucket"), col("n_rows"),
            col("t_num"), col("t_den"), col("t_closeness"))
          .withColumn("breach", col("t_closeness") > 0.25)
          .orderBy("source", "size_bucket")
      },
      Some("""WITH cls AS (
             |  SELECT source, n_chars // 100 AS size_bucket,
             |    CAST(count(*) AS BIGINT) AS n_cls
             |  FROM documents GROUP BY 1, 2),
             |cl AS (
             |  SELECT source, n_chars // 100 AS size_bucket, lang,
             |    CAST(count(*) AS BIGINT) AS cnt_cls
             |  FROM documents GROUP BY 1, 2, 3),
             |gl AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt_tot
             |       FROM documents GROUP BY 1),
             |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM documents),
             |grid AS (
             |  SELECT c.source, c.size_bucket, c.n_cls, g.lang, g.cnt_tot, n_tot,
             |    COALESCE(x.cnt_cls, 0) AS cnt_cls
             |  FROM cls c CROSS JOIN gl g CROSS JOIN nt
             |  LEFT JOIN cl x ON x.source = c.source
             |    AND x.size_bucket = c.size_bucket AND x.lang = g.lang)
             |SELECT source, size_bucket, max(n_cls) AS n_rows,
             |  CAST(sum(abs(cnt_cls * n_tot - cnt_tot * n_cls)) AS DOUBLE) AS t_num,
             |  CAST(max(n_cls) * max(n_tot) * 2 AS DOUBLE) AS t_den,
             |  CAST(sum(abs(cnt_cls * n_tot - cnt_tot * n_cls)) AS DOUBLE)
             |    / CAST(max(n_cls) * max(n_tot) * 2 AS DOUBLE) AS t_closeness,
             |  CAST(sum(abs(cnt_cls * n_tot - cnt_tot * n_cls)) AS DOUBLE)
             |    / CAST(max(n_cls) * max(n_tot) * 2 AS DOUBLE) > 0.25 AS breach
             |FROM grid GROUP BY 1, 2 ORDER BY source, size_bucket""".stripMargin)),

    // Weighted reservoir sample (Efraimidis & Spirakis 2006, A-Res):
    // top-3 docs per source under quality-proportional weights
    // (w = n_chars), with the "randomness" drawn from the deterministic
    // md5 permille hash so the sample is REPRODUCIBLE — rerunning the
    // pipeline, or recomputing one partition, selects the same docs.
    // A-Res key = u^(1/w) maximized ⟺ ln(u)/w maximized; the key is
    // quantized to nano-units BEFORE ranking (the knn_label_vote
    // quantized-ranking pattern) so a last-bit ln() divergence cannot
    // flip membership at the rank-3 boundary, and ties break by doc_id.
    // The per-source rank compiles to WindowGroupLimit — 3 rows of
    // state per source, no global sort at any scale.
    QueryDef(
      "weighted_reservoir_sample",
      (s, d) => {
        val w = Window.partitionBy("source")
          .orderBy(col("key_nano").desc, col("doc_id"))
        t(s, d, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"),
            round(log((PipelineQueries.hashPermille(col("doc_id"), "res") + 1L)
                .cast("double") / lit(1e6)) /
              col("n_chars").cast("double") * lit(1e9))
              .cast("long").as("key_nano"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("source", "doc_id", "n_chars", "key_nano", "rk")
          .orderBy("source", "rk")
      },
      Some {
        val h = PipelineQueries.hashSqlExpr("doc_id", "res")
        s"""WITH keyed AS (
           |  SELECT source, doc_id, n_chars,
           |    CAST(round(ln(CAST(($h) + 1 AS DOUBLE) / 1e6)
           |      / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS key_nano
           |  FROM documents)
           |SELECT source, doc_id, n_chars, key_nano, rk FROM (
           |  SELECT source, doc_id, n_chars, key_nano,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY source
           |         ORDER BY key_nano DESC, doc_id) AS BIGINT) AS rk
           |  FROM keyed)
           |WHERE rk <= 3 ORDER BY source, rk""".stripMargin
      }),

    // Freshness/completeness SLA audit of the event log, per event
    // type: first/last seen, distinct active days, and the number of
    // silent days inside the observed span — the data-contract
    // monitoring card (a type whose missing_days jumps has a broken
    // producer even if total volume looks fine). One groupBy(type) with
    // a two-level distinct-day aggregate; span arithmetic is exact
    // DATE math.
    QueryDef(
      "data_freshness_audit",
      (s, d) => t(s, d, "events")
        .select(col("event_type"), col("ts"),
          col("ts").cast("date").as("day"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"),
          countDistinct(col("day")).as("n_active_days"))
        .withColumn("span_days",
          (datediff(col("last_ts").cast("date"), col("first_ts").cast("date")) + 1)
            .cast("long"))
        .withColumn("missing_days", col("span_days") - col("n_active_days"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n_events,
             |  min(ts) AS first_ts, max(ts) AS last_ts,
             |  count(DISTINCT CAST(ts AS DATE)) AS n_active_days,
             |  CAST(date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) + 1
             |       AS BIGINT) AS span_days,
             |  CAST(date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) + 1
             |       AS BIGINT) - count(DISTINCT CAST(ts AS DATE)) AS missing_days
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Event-time monotonicity audit — client clock skew and transport
    // reordering detector: within each user's stream ORDERED BY
    // event_id (the ingestion sequence), count adjacent pairs whose
    // event time goes BACKWARD, and measure the worst regression — the
    // number that decides whether event-time or ingestion-time should
    // drive windowing, and how wide a watermark must be to absorb the
    // observed disorder (cf. streaming_late_data_audit's 90-minute
    // budget). On THIS corpus the answer is the certification itself:
    // 0 regressions over every adjacent pair pins the generator's
    // in-order delivery as an invariant — the SCD2/sessionization
    // suites lean on event_id as a tiebreaker, and this row is the
    // check that entitles them to. One LEAD window per user, exact μs
    // integers, a 1-row corpus rollup with the disorder fraction.
    QueryDef(
      "clock_skew_audit",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"))
          .withColumn("next_us", lead("us", 1).over(w))
          .filter(col("next_us").isNotNull)
          .select((col("next_us") - col("us")).as("delta_us"))
          .agg(count(lit(1)).as("n_adjacent_pairs"),
            sum(when(col("delta_us") < 0, 1L).otherwise(0L)).as("n_regressions"),
            coalesce(min(when(col("delta_us") < 0, col("delta_us"))), lit(0L))
              .as("worst_regression_us"))
          .withColumn("disorder_frac",
            col("n_regressions").cast("double") /
              col("n_adjacent_pairs").cast("double"))
      },
      Some("""WITH seq AS (
             |  SELECT LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id
             |      ORDER BY event_id) - epoch_us(ts) AS delta_us
             |  FROM events)
             |SELECT CAST(count(*) AS BIGINT) AS n_adjacent_pairs,
             |  CAST(sum(CASE WHEN delta_us < 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_regressions,
             |  CAST(coalesce(min(CASE WHEN delta_us < 0 THEN delta_us END), 0)
             |    AS BIGINT) AS worst_regression_us,
             |  CAST(sum(CASE WHEN delta_us < 0 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) AS disorder_frac
             |FROM seq WHERE delta_us IS NOT NULL""".stripMargin)),

    // Isotonic calibration of the model score (pool-adjacent-violators
    // in its closed minimax form): the monotone-regression step that
    // turns calibration_reliability_bins' DIAGNOSIS into the actual
    // recalibration map a serving system applies. Over the 50-bin score
    // histogram, the PAV fit at bin k equals
    // max_{i≤k} min_{j≥k} mean(y over bins i..j) (Barlow et al. 1972)
    // — evaluated exactly from prefix sums, so no sequential
    // pool-merge loop is needed and the whole fit is three bounded
    // joins. Every mean is a ratio of exact BIGINTs computed by the
    // identical double division on both engines. Scale shape: the
    // per-user pass reduces map-side to 50 bin rows; everything after
    // runs on O(bins³)≈66k in-memory rows REGARDLESS of user count —
    // the bin width, not the data, sets the cost (sequential PAV on a
    // driver would be the alternative; this stays declarative).
    QueryDef(
      "isotonic_calibration_pav",
      (s, d) => {
        val bins = scoredUsers(s, d)
          .groupBy(expr("score_pm div 20000").as("cal_bin"))
          .agg(count(lit(1)).as("w"), sum("conv").as("y"))
        val wb = Window.orderBy("cal_bin").rowsBetween(Window.unboundedPreceding, 0)
        val pref = bins
          .withColumn("cw", sum("w").over(wb))
          .withColumn("cy", sum("y").over(wb))
          .select(col("cal_bin"), col("cw"), col("cy"))
        val pref0 = pref.unionAll(
          s.range(1).select(lit(-1L).as("cal_bin"), lit(0L).as("cw"), lit(0L).as("cy")))
        val pairs = pref0.as("i")
          .join(broadcast(pref.as("j")), col("i.cal_bin") < col("j.cal_bin"))
          .select(col("i.cal_bin").as("i0"), col("j.cal_bin").as("jj"),
            ((col("j.cy") - col("i.cy")).cast("double") /
              (col("j.cw") - col("i.cw")).cast("double")).as("m"))
        val innerM = pairs
          .join(broadcast(bins.select(col("cal_bin").as("k"))),
            col("i0") < col("k") && col("jj") >= col("k"))
          .groupBy("i0", "k").agg(min("m").as("im"))
        val fit = innerM.groupBy("k").agg(max("im").as("iso_rate"))
        bins.join(broadcast(fit), col("cal_bin") === col("k"))
          .select(col("cal_bin").as("bin"), col("w").as("n_users"), col("y").as("n_conv"),
            (col("y").cast("double") / col("w").cast("double")).as("raw_rate"),
            col("iso_rate"))
          .orderBy("bin")
      },
      Some(s"""WITH su AS ($scoredUsersSql),
              |bins AS (
              |  SELECT score_pm // 20000 AS b, CAST(count(*) AS BIGINT) AS w,
              |    CAST(sum(conv) AS BIGINT) AS y
              |  FROM su GROUP BY 1),
              |pref AS (
              |  SELECT b,
              |    CAST(sum(w) OVER (ORDER BY b
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
              |    CAST(sum(y) OVER (ORDER BY b
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cy
              |  FROM bins),
              |pref0 AS (SELECT * FROM pref UNION ALL SELECT -1, 0, 0),
              |pairs AS (
              |  SELECT i.b AS i0, j.b AS jj,
              |    CAST(j.cy - i.cy AS DOUBLE) / CAST(j.cw - i.cw AS DOUBLE) AS m
              |  FROM pref0 i JOIN pref j ON i.b < j.b),
              |inner_m AS (
              |  SELECT i0, k.b AS k, min(m) AS im
              |  FROM pairs JOIN bins k ON pairs.i0 < k.b AND pairs.jj >= k.b
              |  GROUP BY 1, 2),
              |fit AS (SELECT k, max(im) AS iso_rate FROM inner_m GROUP BY k)
              |SELECT bins.b AS bin, w AS n_users, y AS n_conv,
              |  CAST(y AS DOUBLE) / CAST(w AS DOUBLE) AS raw_rate, iso_rate
              |FROM bins JOIN fit ON bins.b = fit.k ORDER BY bin""".stripMargin)),

    // Simpson's-paradox audit of the score→conversion association: the
    // high-vs-low-score conversion-rate difference computed overall AND
    // within each market-segment stratum, with a per-stratum flag for
    // sign reversal against the pooled estimate — the analysis-
    // integrity check that catches a confounded readout before anyone
    // ships "the score works" (a positive pooled lift can be negative
    // in every stratum when segment mix correlates with score). One
    // ROLLUP aggregate produces strata + pooled in a single pass; all
    // counts exact BIGINT, the two rate divisions and the sign product
    // are identical double ops; the 1-row pooled diff broadcasts back.
    QueryDef(
      "simpson_paradox_audit",
      (s, d) => {
        val su = scoredUsers(s, d)
          .withColumn("hi", (col("score_pm") >= 500000L).cast("long"))
        val seg = t(s, d, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("stratum"))
        val base = su.join(seg, "user_id")
          .select(col("stratum"), col("hi"), col("conv"))
        // per-stratum + pooled as two grouped aggregates unioned (the
        // ROLLUP equivalent — rollup() on a joined column trips Spark's
        // ambiguous-self-join detector via its grouping metadata)
        def cells(df: org.apache.spark.sql.DataFrame, key: org.apache.spark.sql.Column) =
          df.groupBy(key.as("stratum")).agg(
            sum(when(col("hi") === 1L, 1L).otherwise(0L)).as("n_high"),
            sum(when(col("hi") === 1L, col("conv")).otherwise(0L)).as("conv_high"),
            sum(when(col("hi") === 0L, 1L).otherwise(0L)).as("n_low"),
            sum(when(col("hi") === 0L, col("conv")).otherwise(0L)).as("conv_low"))
        val g = cells(base, col("stratum")).unionAll(cells(base, lit("ALL")))
          .withColumn("rate_diff",
            when(col("n_high") > 0 && col("n_low") > 0,
              col("conv_high").cast("double") / col("n_high").cast("double") -
                col("conv_low").cast("double") / col("n_low").cast("double")))
        // the pooled diff rides a 6-row window rather than a self-join
        // (the ALL row is already in g; a filter+crossJoin of the same
        // lineage trips the ambiguous-self-join analyzer)
        g.withColumn("all_diff",
            max(when(col("stratum") === "ALL", col("rate_diff")))
              .over(Window.partitionBy(lit(1))))
          .select(col("stratum"), col("n_high"), col("conv_high"),
            col("n_low"), col("conv_low"), col("rate_diff"),
            (col("rate_diff") * col("all_diff") < 0).as("sign_reversed"))
          .orderBy("stratum")
      },
      Some(s"""WITH su AS ($scoredUsersSql),
              |base AS (
              |  SELECT conv, CASE WHEN score_pm >= 500000 THEN 1 ELSE 0 END AS hi,
              |    c_mktsegment AS stratum
              |  FROM su JOIN customer ON su.user_id = c_custkey),
              |g AS (
              |  SELECT coalesce(stratum, 'ALL') AS stratum,
              |    CAST(sum(CASE WHEN hi = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
              |    CAST(sum(CASE WHEN hi = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_high,
              |    CAST(sum(CASE WHEN hi = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
              |    CAST(sum(CASE WHEN hi = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_low
              |  FROM base GROUP BY ROLLUP(stratum)),
              |dd AS (
              |  SELECT *,
              |    CASE WHEN n_high > 0 AND n_low > 0
              |      THEN CAST(conv_high AS DOUBLE) / CAST(n_high AS DOUBLE)
              |        - CAST(conv_low AS DOUBLE) / CAST(n_low AS DOUBLE)
              |      END AS rate_diff
              |  FROM g),
              |o AS (SELECT rate_diff AS all_diff FROM dd WHERE stratum = 'ALL')
              |SELECT stratum, n_high, conv_high, n_low, conv_low, rate_diff,
              |  (rate_diff * all_diff) < 0 AS sign_reversed
              |FROM dd CROSS JOIN o ORDER BY stratum""".stripMargin)))
}
