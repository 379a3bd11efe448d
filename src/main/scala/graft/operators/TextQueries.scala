package graft.operators

import graft.QueryDef
import graft.QueryDef.t
import graft.text.TextOps

import org.apache.spark.sql.functions._

/** Text-analysis queries over `documents` with DuckDB oracles. The corpus is
  * single-space tokenized (verified at build time), so token counts and
  * length stats are integer-exact on both engines.
  */
object TextQueries {

  private def stopList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** DuckDB multiset stopword count over space-split tokens. */
  private def hitsSql(ws: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), w -> w IN ${stopList(ws)}))"

  val defs: Seq[QueryDef] = Seq(

    // Token counting + length stats (exact integer arithmetic both sides).
    QueryDef(
      "text_token_stats",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars_measured"),
        TextOps.avgTokenLength(col("text")).as("avg_token_len")),
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  length(text) AS n_chars_measured,
             |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
             |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
             |FROM documents""".stripMargin)),

    // Gopher-style repetition filters: duplicate-n-gram fraction and
    // most-frequent-bigram mass per document. Entirely per-row HOF
    // arithmetic over the shingle arrays — zero shuffles, pipelines into
    // the scan; the inner quadratic is bounded by document length, not
    // corpus size, so the shape is identical at 100 TB.
    QueryDef(
      "text_repetition_ratio",
      (s, d) => {
        import graft.dedup.Dedup
        val bg = Dedup.shingles(col("text"), 2)
        val tg = Dedup.shingles(col("text"), 3)
        def dupFrac(a: org.apache.spark.sql.Column) = when(size(a) > 0,
          lit(1.0) - size(array_distinct(a)).cast("double") / size(a).cast("double"))
          .otherwise(lit(0.0))
        // r17 (guide §1.2 step 2 — per-task work): the most-frequent-bigram
        // count was "for each DISTINCT bigram, filter-count the whole
        // array" — O(distinct·n) per document, the catalog's one
        // quadratic-in-doc-length expression (1.71 s at sf0.1, zero
        // shuffle). Equal multiset counts are run lengths in the SORTED
        // array, so one sort + one linear fold computes the same integer:
        // max run of equal adjacent elements = max bigram frequency.
        // O(n log n) per doc, same value, same output columns.
        // acc.prev starts "" which no real bigram equals (bigrams contain
        // a space); n_bigrams > 0 is guarded by the surrounding `when`.
        val topCount = aggregate(
          array_sort(bg),
          struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
          (acc, x) => {
            val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
              .otherwise(lit(1))
            struct(x.as("prev"), run.as("run"),
              greatest(acc.getField("best"), run).as("best"))
          },
          acc => acc.getField("best"))
        t(s, d, "documents").select(
          col("doc_id"),
          size(bg).cast("long").as("n_bigrams"),
          dupFrac(bg).as("dup_bigram_frac"),
          dupFrac(tg).as("dup_trigram_frac"),
          when(size(bg) > 0, topCount.cast("double") / size(bg).cast("double"))
            .otherwise(lit(0.0)).as("top_bigram_frac"))
      },
      Some {
        def ng(n: Int) = s"list_transform(range(0, len(string_split(text, ' ')) - ${n - 1}), " +
          s"i -> array_to_string((string_split(text, ' '))[i+1:i+$n], ' '))"
        def dupFrac(a: String) =
          s"CASE WHEN len($a) > 0 THEN 1.0 - CAST(len(list_distinct($a)) AS DOUBLE) " +
            s"/ CAST(len($a) AS DOUBLE) ELSE 0.0 END"
        s"""WITH g AS (SELECT doc_id, ${ng(2)} AS bg, ${ng(3)} AS tg FROM documents)
           |SELECT doc_id,
           |  CAST(len(bg) AS BIGINT) AS n_bigrams,
           |  ${dupFrac("bg")} AS dup_bigram_frac,
           |  ${dupFrac("tg")} AS dup_trigram_frac,
           |  CASE WHEN len(bg) > 0
           |       THEN CAST(list_aggregate(list_transform(list_distinct(bg),
           |              x -> len(list_filter(bg, y -> y = x))), 'max') AS DOUBLE)
           |            / CAST(len(bg) AS DOUBLE)
           |       ELSE 0.0 END AS top_bigram_frac
           |FROM g""".stripMargin
      }),

    // Stopword-argmax language ID (TextOps.langId), fixed precedence.
    QueryDef(
      "text_lang_id",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        TextOps.langId(col("text")).as("lang_pred")),
      Some(s"""SELECT doc_id,
              |  CASE
              |    WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
              |    WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
              |    WHEN de > 0 AND de >= fr THEN 'de'
              |    WHEN fr > 0 THEN 'fr'
              |    ELSE 'und' END AS lang_pred
              |FROM (SELECT doc_id,
              |        ${hitsSql(TextOps.EnStop)} AS en,
              |        ${hitsSql(TextOps.EsStop)} AS es,
              |        ${hitsSql(TextOps.DeStop)} AS de,
              |        ${hitsSql(TextOps.FrStop)} AS fr
              |      FROM documents)""".stripMargin)),

    // Language-ID agreement matrix: heuristic prediction (TextOps.langId)
    // cross-tabulated against the corpus's labeled `lang` column — the
    // classifier-audit every lang-filtered training mix needs before the
    // filter runs at scale (a systematic en→und leak at 100 TB silently
    // drops an entire language from the mix; the confusion matrix is how
    // it gets caught). One projection pass + one tiny rollup shuffle
    // (|langs|² rows); counts are integer-exact.
    QueryDef(
      "lang_id_confusion",
      (s, d) => t(s, d, "documents")
        .select(col("lang"), TextOps.langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "lang_pred"),
      Some(s"""SELECT lang,
              |  CASE
              |    WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
              |    WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
              |    WHEN de > 0 AND de >= fr THEN 'de'
              |    WHEN fr > 0 THEN 'fr'
              |    ELSE 'und' END AS lang_pred,
              |  count(*) AS n_docs
              |FROM (SELECT lang,
              |        ${hitsSql(TextOps.EnStop)} AS en,
              |        ${hitsSql(TextOps.EsStop)} AS es,
              |        ${hitsSql(TextOps.DeStop)} AS de,
              |        ${hitsSql(TextOps.FrStop)} AS fr
              |      FROM documents)
              |GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin)),

    // Cohen's kappa for the language-ID classifier — chance-corrected
    // agreement over the SAME confusion matrix lang_id_confusion emits
    // (accuracy alone flatters a classifier on a skewed lang mix; kappa
    // is the number a filter-quality gate should threshold). κ =
    // (N·Σdiag − Σ rowᵢ·colᵢ) / (N² − Σ rowᵢ·colᵢ), assembled entirely
    // from exact BIGINT cell counts — cross products stay < 2^63 until
    // corpus doc counts pass ~3e9, where the established DECIMAL(38,0)
    // escape applies; here both engines compute one double division
    // over exact integers. Scale shape: one projection pass into the
    // |langs|² cell matrix; every later term is matrix-bounded.
    QueryDef(
      "cohens_kappa_langid",
      (s, d) => {
        val cm = t(s, d, "documents")
          .select(col("lang"), TextOps.langId(col("text")).as("lang_pred"))
          .groupBy("lang", "lang_pred")
          .agg(count(lit(1)).as("n"))
        val rows = cm.groupBy("lang").agg(sum("n").as("row_n"))
        val cols = cm.groupBy(col("lang_pred").as("lang")).agg(sum("n").as("col_n"))
        val marg = rows.join(cols, Seq("lang"), "full_outer")
          .select(coalesce(col("row_n"), lit(0L)).as("row_n"),
            coalesce(col("col_n"), lit(0L)).as("col_n"))
          .agg(sum(col("row_n")).as("n_total"),
            sum(col("row_n") * col("col_n")).as("chance_x"))
        val diag = cm.filter(col("lang") === col("lang_pred"))
          .agg(sum("n").as("agree"))
        marg.crossJoin(broadcast(diag))
          .select(col("n_total"), col("agree"), col("chance_x"),
            ((col("n_total") * col("agree") - col("chance_x")).cast("double") /
              (col("n_total") * col("n_total") - col("chance_x")).cast("double"))
              .as("kappa"),
            (col("agree").cast("double") / col("n_total").cast("double"))
              .as("accuracy"))
      },
      Some(s"""WITH cm AS (
              |  SELECT lang,
              |    CASE
              |      WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
              |      WHEN es > 0 AND es >= de AND es >= fr THEN 'es'
              |      WHEN de > 0 AND de >= fr THEN 'de'
              |      WHEN fr > 0 THEN 'fr'
              |      ELSE 'und' END AS lang_pred,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM (SELECT lang,
              |          ${hitsSql(TextOps.EnStop)} AS en,
              |          ${hitsSql(TextOps.EsStop)} AS es,
              |          ${hitsSql(TextOps.DeStop)} AS de,
              |          ${hitsSql(TextOps.FrStop)} AS fr
              |        FROM documents)
              |  GROUP BY 1, 2),
              |r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS row_n FROM cm GROUP BY 1),
              |c AS (SELECT lang_pred AS lang, CAST(sum(n) AS BIGINT) AS col_n
              |      FROM cm GROUP BY 1),
              |m AS (
              |  SELECT CAST(sum(coalesce(row_n, 0)) AS BIGINT) AS n_total,
              |    CAST(sum(coalesce(row_n, 0) * coalesce(col_n, 0)) AS BIGINT)
              |      AS chance_x
              |  FROM r FULL OUTER JOIN c USING (lang)),
              |dg AS (SELECT CAST(sum(n) AS BIGINT) AS agree
              |       FROM cm WHERE lang = lang_pred)
              |SELECT n_total, agree, chance_x,
              |  CAST(n_total * agree - chance_x AS DOUBLE)
              |    / CAST(n_total * n_total - chance_x AS DOUBLE) AS kappa,
              |  CAST(agree AS DOUBLE) / CAST(n_total AS DOUBLE) AS accuracy
              |FROM m CROSS JOIN dg""".stripMargin)),

    // Quality scoring: per-row double arithmetic, engine-identical.
    QueryDef(
      "text_quality_score",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality")),
      Some(s"""SELECT doc_id,
              |  0.4 * least(n_tok / 64.0, 1.0)
              |  + 0.3 * least((en_hits / n_tok) * 5.0, 1.0)
              |  + 0.3 * (CASE WHEN awl >= 3.0 AND awl <= 10.0 THEN 1.0 ELSE 0.0 END) AS quality
              |FROM (SELECT doc_id,
              |        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
              |        CAST(${hitsSql(TextOps.EnStop)} AS DOUBLE) AS en_hits,
              |        CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
              |          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS awl
              |      FROM documents)""".stripMargin)),

    // The composed cleaning gate — the screens above wired in the order a
    // production pipeline fires them, each doc getting its FIRST failing
    // rule as a verdict (too_short → lang_unknown → repetitive →
    // low_quality → pass), rolled up to audit counts per (lang, verdict).
    // Still one projection pass over the corpus (every rule is per-row
    // arithmetic already individually oracle-proven: token counts,
    // stopword argmax, dup-bigram fraction, quality score) + one tiny
    // rollup shuffle — the composition costs nothing beyond its parts,
    // which is the point of declarative per-row rules at 100 TB. All
    // threshold compares are on engine-identical doubles.
    QueryDef(
      "corpus_quality_gate",
      (s, d) => {
        val bg = graft.dedup.Dedup.shingles(col("text"), 2)
        val dupFrac = when(size(bg) > 0,
          lit(1.0) - size(array_distinct(bg)).cast("double") / size(bg).cast("double"))
          .otherwise(lit(0.0))
        val verdict = when(TextOps.tokenCount(col("text")) < 8, "too_short")
          .when(TextOps.langId(col("text")) === "und", "lang_unknown")
          .when(dupFrac > 0.2, "repetitive")
          .when(TextOps.qualityScore(col("text")) < 0.5, "low_quality")
          .otherwise("pass")
        t(s, d, "documents")
          .select(col("lang"), verdict.as("verdict"),
            TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
          .groupBy("lang", "verdict")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
          .orderBy("lang", "verdict")
      },
      Some {
        val bg = "list_transform(range(0, len(string_split(text, ' ')) - 1), " +
          "i -> array_to_string((string_split(text, ' '))[i+1:i+2], ' '))"
        s"""WITH scored AS (
           |  SELECT lang, len(string_split(text, ' ')) AS n_tok,
           |    CASE WHEN len(string_split(text, ' ')) < 8 THEN 'too_short'
           |         WHEN NOT (${hitsSql(TextOps.EnStop)} > 0
           |                   OR ${hitsSql(TextOps.EsStop)} > 0
           |                   OR ${hitsSql(TextOps.DeStop)} > 0
           |                   OR ${hitsSql(TextOps.FrStop)} > 0) THEN 'lang_unknown'
           |         WHEN (CASE WHEN len($bg) > 0
           |               THEN 1.0 - CAST(len(list_distinct($bg)) AS DOUBLE)
           |                    / CAST(len($bg) AS DOUBLE) ELSE 0.0 END) > 0.2
           |           THEN 'repetitive'
           |         WHEN (0.4 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 64.0, 1.0)
           |               + 0.3 * least((CAST(${hitsSql(TextOps.EnStop)} AS DOUBLE)
           |                   / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5.0, 1.0)
           |               + 0.3 * (CASE WHEN
           |                   CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
           |                     / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 3.0
           |                   AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
           |                     / CAST(len(string_split(text, ' ')) AS DOUBLE) <= 10.0
           |                   THEN 1.0 ELSE 0.0 END)) < 0.5 THEN 'low_quality'
           |         ELSE 'pass' END AS verdict
           |  FROM documents)
           |SELECT lang, verdict, count(*) AS n_docs,
           |  CAST(sum(n_tok) AS BIGINT) AS total_tokens
           |FROM scored GROUP BY lang, verdict ORDER BY lang, verdict""".stripMargin
      }),

    // Per-stratum quantile gate: keep each lang's top half by quality
    // score — the standard corpus-pruning step between scoring and
    // training. percent_rank over (lang, quality) is exact and
    // engine-identical ((rank-1)/(n-1), same double division both sides;
    // the score itself is per-row double arithmetic already proven
    // identical by text_quality_score). Scale: one shuffle on lang — at
    // extreme skew you'd pre-compute per-lang approx thresholds and
    // broadcast them; the window form is the exact-oracle variant.
    QueryDef(
      "quality_median_filter",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("quality"), col("doc_id"))
        t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            TextOps.qualityScore(col("text")).as("quality"))
          .withColumn("pr", percent_rank().over(w))
          .filter(col("pr") >= 0.5)
          .select("doc_id", "lang", "quality")
      },
      Some(s"""WITH scored AS (
              |  SELECT doc_id, lang,
              |    0.4 * least(n_tok / 64.0, 1.0)
              |    + 0.3 * least((en_hits / n_tok) * 5.0, 1.0)
              |    + 0.3 * (CASE WHEN awl >= 3.0 AND awl <= 10.0 THEN 1.0 ELSE 0.0 END) AS quality
              |  FROM (SELECT doc_id, lang,
              |          CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
              |          CAST(${hitsSql(TextOps.EnStop)} AS DOUBLE) AS en_hits,
              |          CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
              |            / CAST(len(string_split(text, ' ')) AS DOUBLE) AS awl
              |        FROM documents))
              |SELECT doc_id, lang, quality FROM (
              |  SELECT *, PERCENT_RANK() OVER (PARTITION BY lang
              |    ORDER BY quality, doc_id) AS pr
              |  FROM scored) WHERE pr >= 0.5""".stripMargin)),

    // Manual pivot via conditional aggregation (the portable PIVOT shape:
    // Spark's .pivot and DuckDB's PIVOT both desugar to this).
    QueryDef(
      "text_lang_pivot",
      (s, d) => {
        val langs = Seq("en", "es", "de", "fr", "zh")
        t(s, d, "documents").groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            langs.map(l => count(when(col("lang") === l, 1)).as(s"n_$l")): _*)
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  count(*) FILTER (lang = 'en') AS n_en,
             |  count(*) FILTER (lang = 'es') AS n_es,
             |  count(*) FILTER (lang = 'de') AS n_de,
             |  count(*) FILTER (lang = 'fr') AS n_fr,
             |  count(*) FILTER (lang = 'zh') AS n_zh
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // BPE-style pre-tokenization (the GPT-2 pretokenizer shape): contraction
    // suffixes, space-prefixed letter/digit runs, punctuation runs. The
    // pattern uses only constructs with identical semantics in Java regex
    // (Spark) and RE2 (DuckDB): alternation, non-capturing groups, ASCII
    // classes, \s. Non-ASCII codepoints fall into the punctuation arm on
    // both engines (both match per-codepoint on BMP text).
    QueryDef(
      "text_bpe_tokens",
      (s, d) => {
        val pat = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9']+"
        val toks = regexp_extract_all(lower(col("text")), lit(pat), lit(0))
        t(s, d, "documents").select(
          col("doc_id"),
          size(toks).cast("long").as("n_bpe"),
          size(array_distinct(toks)).cast("long").as("n_distinct_bpe"),
          // Joined to a scalar string: the driver's comparator cannot sort
          // raw array columns (round-1 comparator crash).
          array_join(slice(toks, 1, 3), ",").as("bpe_head"))
      },
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(lower(text),
             |    '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9'']+')) AS n_bpe,
             |  len(list_distinct(regexp_extract_all(lower(text),
             |    '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9'']+'))) AS n_distinct_bpe,
             |  array_to_string((regexp_extract_all(lower(text),
             |    '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9'']+'))[1:3], ',') AS bpe_head
             |FROM documents""".stripMargin)),

    // Rolling-hash fingerprint: exact modular integer arithmetic both sides.
    QueryDef(
      "text_fingerprint",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        TextOps.fingerprintRolling(col("text")).as("fp_rolling"),
        TextOps.fingerprintMd5(col("text")).as("fp_md5")),
      Some("""SELECT doc_id,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
             |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp_rolling,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
             |FROM documents""".stripMargin)),

    // PII redaction scan — the scrubbing pass every released corpus runs
    // (emails/phones → placeholder tokens). The synthetic corpus carries no
    // PII, so the query first enriches it deterministically (doc_id-keyed
    // e-mail / phone suffixes — both engines build the identical string)
    // and then counts and redacts; the md5 of the redacted text pins the
    // byte-exact rewrite, not just the counts. Patterns stay in the shared
    // RE2 subset (char classes + bounded repeats, no lookaround); Spark
    // replaces globally by default, DuckDB needs the explicit 'g' flag.
    // Per-row regex work only — zero shuffles, pipelines into the scan.
    QueryDef(
      "pii_redaction_scan",
      (s, d) => {
        val emailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
        val phoneRe = "555-[0-9]{4}"
        val raw = concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")))
        t(s, d, "documents")
          .withColumn("raw", raw)
          .select(col("doc_id"),
            size(regexp_extract_all(col("raw"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
            size(regexp_extract_all(col("raw"), lit(phoneRe), lit(0))).cast("long").as("n_phones"),
            md5(regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>")).as("redacted_md5"))
      },
      Some("""WITH enriched AS (
             |  SELECT doc_id, text ||
             |    CASE WHEN doc_id % 3 = 0
             |         THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
             |    CASE WHEN doc_id % 5 = 0
             |         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |         ELSE '' END AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  len(regexp_extract_all(raw, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS n_emails,
             |  len(regexp_extract_all(raw, '555-[0-9]{4}')) AS n_phones,
             |  md5(regexp_replace(regexp_replace(raw,
             |    '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
             |    '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
             |FROM enriched""".stripMargin)),

    // Tokenizer fertility per language — BPE-piece count over whitespace
    // word count, the standard "how many pieces per word does this
    // tokenizer pay on this language" metric that drives per-language
    // token budgets and flags scripts the vocabulary serves badly.
    // Both token counts are exact integers from the same codegen'd
    // per-row expressions the token-stats queries use (one scan, no
    // shuffle beyond the ~20-row lang aggregate); fertility is a single
    // division of exact sums.
    QueryDef(
      "tokenizer_fertility",
      (s, d) => {
        val pat = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9']+"
        t(s, d, "documents")
          .select(col("lang"),
            size(regexp_extract_all(lower(col("text")), lit(pat), lit(0)))
              .cast("long").as("n_bpe"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_words"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_bpe")).as("sum_bpe"),
            sum(col("n_words")).as("sum_words"))
          .withColumn("fertility",
            col("sum_bpe").cast("double") / col("sum_words").cast("double"))
      },
      Some("""WITH per AS (
             |  SELECT lang,
             |    len(regexp_extract_all(lower(text),
             |      '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9'']+')) AS n_bpe,
             |    len(string_split(text, ' ')) AS n_words
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(n_bpe) AS BIGINT) AS sum_bpe,
             |  CAST(sum(n_words) AS BIGINT) AS sum_words,
             |  CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE) AS fertility
             |FROM per GROUP BY lang""".stripMargin)),

    // Code-likeness heuristic — the pretraining-mix router that separates
    // code-shaped documents from prose BEFORE an expensive classifier
    // runs: per doc, counts of code-indicative symbol characters
    // ({}();=<>[]#_) and digits via translate-and-diff (pure codegen'd
    // string ops, no regex), combined into an integer permille score
    // (symbols weighted 3×) with an exact integer-division quantization —
    // the same millibit discipline as text_quality_score, so the
    // per-lang aggregate is FP-free on both engines. One scan, bounded
    // lang aggregate.
    QueryDef(
      "text_code_score",
      (s, d) => {
        val syms = "{}();=<>[]#_"
        val doc = t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            length(col("text")).cast("long").as("n"),
            (length(col("text")) -
              length(translate(col("text"), syms, ""))).cast("long").as("n_sym"),
            (length(col("text")) -
              length(translate(col("text"), "0123456789", ""))).cast("long")
              .as("n_dig"))
          .filter(col("n") > 0)
          .withColumn("code_permille",
            expr("(n_sym * 3000 + n_dig * 1000) div n"))
          .withColumn("is_codelike", col("code_permille") >= 60)
        doc.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("is_codelike"), 1L).otherwise(0L)).as("n_codelike"),
            sum(col("code_permille")).as("sum_permille"))
          .withColumn("mean_code_score",
            col("sum_permille").cast("double") / col("n_docs").cast("double")
              / lit(1000.0))
          .orderBy("lang")
      },
      Some("""WITH doc AS (
             |  SELECT lang,
             |    (length(text) - length(translate(text, '{}();=<>[]#_', ''))) * 3000
             |      + (length(text) - length(translate(text, '0123456789', ''))) * 1000
             |      AS num,
             |    length(text) AS n
             |  FROM documents WHERE length(text) > 0),
             |sc AS (SELECT lang, num // n AS code_permille FROM doc)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN code_permille >= 60 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_codelike,
             |  CAST(sum(code_permille) AS BIGINT) AS sum_permille,
             |  CAST(sum(code_permille) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000.0
             |    AS mean_code_score
             |FROM sc GROUP BY lang ORDER BY lang""".stripMargin)),

    // Multinomial Naive Bayes training (McCallum & Nigam 1998) for the
    // lang-given-tokens classifier — the fitted model IS the
    // per-(class, token) count table: ONE map-side-combined aggregate
    // over the corpus, materialized with localCheckpoint (vocab-bounded,
    // node-proportional — the model, never the corpus) so the per-token
    // totals, per-lang totals, and vocab/global scalars all derive from
    // it without a second corpus scan. Emitted per lang: the top-10
    // tokens by in-class count (the mode of the fitted P(token|lang))
    // with their Laplace-smoothed likelihood odds vs the complement
    // class, odds = [(n_lt+1)·(n_¬l+V)] / [(n_¬l,t+1)·(n_l+V)]. Ranking
    // rides EXACT BIGINTs (n_lt desc, token) — never the double — and
    // compiles to WindowGroupLimit over the vocab-bounded count table;
    // the ≤ 10·|langs| survivors BROADCAST into the vocab-sized totals
    // join (the big side streams, the top-k probes). Cross-multiplied
    // odds ride DECIMAL(38,0) internally (BIGINT products overflow once
    // corpus token counts pass ~3e9 — the HUGEINT-guard class) and leave
    // as ONE double division of exact integers (< 2^53 at oracle scale),
    // per the recorded rule: decimal wider than int64 never reaches an
    // output column.
    QueryDef(
      "naive_bayes_train",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("n_lt").desc, col("token"))
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val lt = t(s, d, "documents")
          .select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy("lang", "token").agg(count(lit(1)).as("n_lt"))
          .localCheckpoint(true)
        val tt = lt.groupBy("token").agg(sum("n_lt").as("n_t"))
        val lg = lt.groupBy("lang").agg(sum("n_lt").as("n_l"))
        val g = lt.agg(sum(col("n_lt")).as("g_tok"),
          countDistinct(col("token")).as("v"))
        broadcast(lt.withColumn("rk", row_number().over(w).cast("long"))
            .filter(col("rk") <= 10))
          .join(tt, "token")
          .join(broadcast(lg), "lang")
          .crossJoin(broadcast(g))
          .select(col("lang"), col("rk"), col("token"), col("n_lt"),
            (((col("n_lt") + lit(1L)).cast(d38) *
                (col("g_tok") - col("n_l") + col("v")).cast(d38)).cast("double") /
             ((col("n_t") - col("n_lt") + lit(1L)).cast(d38) *
                (col("n_l") + col("v")).cast(d38)).cast("double")).as("odds"))
          .orderBy("lang", "rk")
      },
      Some("""WITH tok AS (
             |  SELECT lang, unnest(string_split(text, ' ')) AS token
             |  FROM documents),
             |lt AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n_lt
             |       FROM tok GROUP BY 1, 2),
             |tt AS (SELECT token, CAST(sum(n_lt) AS BIGINT) AS n_t
             |       FROM lt GROUP BY 1),
             |lg AS (SELECT lang, CAST(sum(n_lt) AS BIGINT) AS n_l
             |       FROM lt GROUP BY 1),
             |g AS (SELECT CAST(sum(n_lt) AS BIGINT) AS g_tok,
             |             CAST(count(DISTINCT token) AS BIGINT) AS v FROM lt),
             |top AS (
             |  SELECT lang, token, n_lt,
             |    ROW_NUMBER() OVER (PARTITION BY lang
             |                       ORDER BY n_lt DESC, token) AS rk
             |  FROM lt)
             |SELECT p.lang, p.rk, p.token, p.n_lt,
             |  CAST(CAST(p.n_lt + 1 AS HUGEINT)
             |         * CAST(g.g_tok - lg.n_l + g.v AS HUGEINT) AS DOUBLE)
             |  / CAST(CAST(tt.n_t - p.n_lt + 1 AS HUGEINT)
             |         * CAST(lg.n_l + g.v AS HUGEINT) AS DOUBLE) AS odds
             |FROM top p
             |JOIN tt USING (token) JOIN lg USING (lang) CROSS JOIN g
             |WHERE p.rk <= 10
             |ORDER BY lang, rk""".stripMargin)))
}
