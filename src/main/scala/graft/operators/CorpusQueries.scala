package graft.operators

import graft.QueryDef
import graft.QueryDef.t
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextOps

import org.apache.spark.sql.functions._

/** Corpus-level analytics: as-of joins against the change log, token/bigram
  * frequency, log-free TF-IDF, and IVF-style similarity search. All
  * oracle-checked.
  */
object CorpusQueries {

  val defs: Seq[QueryDef] = Seq(

    // As-of join: latest event per customer at order time (the SCD2 lookup
    // operator — see AsOfJoin for why it's a window, not a join).
    QueryDef(
      "asof_join_last_event",
      (s, d) => AsOfJoin.asOf(
        left = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
        right = t(s, d, "events"),
        leftKey = "o_custkey", rightKey = "user_id",
        leftT = "o_orderdate", rightT = "ts", rightSeq = "event_id",
        payload = Seq("event_id"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
                col("asof_event_id")),
      Some("""SELECT o_orderkey, o_custkey, o_orderdate,
             |  (SELECT event_id FROM events
             |   WHERE user_id = o_custkey AND ts <= o_orderdate
             |   ORDER BY ts DESC, event_id DESC LIMIT 1) AS asof_event_id
             |FROM orders""".stripMargin)),

    // Forward as-of: the next event AT OR AFTER each order — the
    // attribution-window lookup (asof_join_last_event is the backward
    // point-in-time read). Same union-window shape, descending time.
    QueryDef(
      "asof_join_next_event",
      (s, d) => AsOfJoin.asOfForward(
        left = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
        right = t(s, d, "events"),
        leftKey = "o_custkey", rightKey = "user_id",
        leftT = "o_orderdate", rightT = "ts", rightSeq = "event_id",
        payload = Seq("event_id"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
                col("asof_event_id").as("next_event_id")),
      Some("""SELECT o_orderkey, o_custkey, o_orderdate,
             |  (SELECT event_id FROM events
             |   WHERE user_id = o_custkey AND ts >= o_orderdate
             |   ORDER BY ts ASC, event_id ASC LIMIT 1) AS next_event_id
             |FROM orders""".stripMargin)),

    // NEAREST-in-time as-of: the event temporally closest to each order,
    // either side (sensor alignment, log correlation — backward-only
    // as-of picks a stale match when the next reading is nearer). A
    // composition of the two window passes: the backward pass's output IS
    // the forward pass's left input, so the plan is two per-key window
    // stages on the same key — still no join node, still linear per key.
    // Distances are exact epoch-microsecond BIGINTs (session-UTC cast on
    // both engines); exact-tie prefers the backward match, null sides
    // fall to the other, both-null users stay null.
    QueryDef(
      "asof_join_nearest_event",
      (s, d) => {
        val orders = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val ev = t(s, d, "events")
        val withPrev = AsOfJoin.asOf(orders, ev,
          leftKey = "o_custkey", rightKey = "user_id",
          leftT = "o_orderdate", rightT = "ts", rightSeq = "event_id",
          payload = Seq("event_id", "ts"))
          .withColumnRenamed("asof_event_id", "prev_id")
          .withColumnRenamed("asof_ts", "prev_ts")
        val both = AsOfJoin.asOfForward(withPrev, ev,
          leftKey = "o_custkey", rightKey = "user_id",
          leftT = "o_orderdate", rightT = "ts", rightSeq = "event_id",
          payload = Seq("event_id", "ts"))
          .withColumnRenamed("asof_event_id", "next_id")
          .withColumnRenamed("asof_ts", "next_ts")
        val pickPrev = col("next_id").isNull ||
          (col("prev_id").isNotNull && col("d_prev") <= col("d_next"))
        both
          .withColumn("ord_us", expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))"))
          .withColumn("d_prev",
            col("ord_us") - expr("unix_micros(CAST(prev_ts AS TIMESTAMP))"))
          .withColumn("d_next",
            expr("unix_micros(CAST(next_ts AS TIMESTAMP))") - col("ord_us"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            when(pickPrev, col("prev_id")).otherwise(col("next_id"))
              .as("nearest_event_id"),
            when(pickPrev, col("d_prev")).otherwise(col("d_next"))
              .as("nearest_abs_us"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_custkey, o_orderdate,
             |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS ord_us,
             |    (SELECT event_id FROM events
             |     WHERE user_id = o_custkey AND ts <= o_orderdate
             |     ORDER BY ts DESC, event_id DESC LIMIT 1) AS prev_id,
             |    (SELECT epoch_us(ts) FROM events
             |     WHERE user_id = o_custkey AND ts <= o_orderdate
             |     ORDER BY ts DESC, event_id DESC LIMIT 1) AS prev_us,
             |    (SELECT event_id FROM events
             |     WHERE user_id = o_custkey AND ts >= o_orderdate
             |     ORDER BY ts ASC, event_id ASC LIMIT 1) AS next_id,
             |    (SELECT epoch_us(ts) FROM events
             |     WHERE user_id = o_custkey AND ts >= o_orderdate
             |     ORDER BY ts ASC, event_id ASC LIMIT 1) AS next_us
             |  FROM orders)
             |SELECT o_orderkey, o_custkey, o_orderdate,
             |  CASE WHEN next_id IS NULL
             |         OR (prev_id IS NOT NULL AND ord_us - prev_us <= next_us - ord_us)
             |       THEN prev_id ELSE next_id END AS nearest_event_id,
             |  CASE WHEN next_id IS NULL
             |         OR (prev_id IS NOT NULL AND ord_us - prev_us <= next_us - ord_us)
             |       THEN ord_us - prev_us ELSE next_us - ord_us END AS nearest_abs_us
             |FROM base""".stripMargin)),

    // Classic distributed wordcount over the corpus (map-side partial agg).
    QueryDef(
      "text_wordcount",
      (s, d) => t(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(100),
      Some("""SELECT token, count(*) AS freq
             |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
             |GROUP BY token ORDER BY freq DESC, token LIMIT 100""".stripMargin)),

    // Bigram frequency via the codegen shingle expression.
    QueryDef(
      "text_bigram_freq",
      (s, d) => t(s, d, "documents")
        .select(explode(Dedup.shingles(col("text"), 2)).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("bigram"))
        .limit(50),
      Some("""SELECT bigram, count(*) AS freq
             |FROM (SELECT unnest(list_transform(range(0, len(string_split(text, ' ')) - 1),
             |        i -> array_to_string((string_split(text, ' '))[i+1:i+2], ' '))) AS bigram
             |      FROM documents WHERE len(string_split(text, ' ')) >= 2)
             |GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 50""".stripMargin)),

    // Pointwise mutual information over adjacent token pairs — the
    // collocation detector (word2vec/GloVe-era PMI matrices; still the
    // standard phrase-mining signal): PMI(a,b) = log2(p(ab)/(p(a)p(b))),
    // computed from three integer count aggregates (unigrams, bigrams,
    // corpus totals). Numeric policy: every count is an exact BIGINT; the
    // only FP is log2 over those integers, combined in a FIXED expression
    // tree (identical association on both engines) and immediately
    // quantized to millibits, with the bigram string as the final
    // tie-break — a sub-ulp log divergence cannot reorder the top-k.
    // Scale shape: two token-keyed aggregates + two token-keyed joins
    // (vocabulary-sized, not corpus-sized) + two 1-row broadcast totals;
    // the min-support filter (cb ≥ 5) prunes the long tail before the
    // joins, exactly as production phrase miners do.
    QueryDef(
      "token_pmi_pairs",
      (s, d) => {
        val uni = t(s, d, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cu"))
        val totU = uni.agg(sum(col("cu")).as("tu"))
        val totB = t(s, d, "documents")
          .select(greatest(size(split(col("text"), " ")) - 1, lit(0))
            .cast("long").as("nb"))
          .agg(sum(col("nb")).as("tb"))
        val bi = t(s, d, "documents")
          .select(explode(Dedup.shingles(col("text"), 2)).as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("cb"))
          .filter(col("cb") >= 5)
          .withColumn("a", expr("split(bigram, ' ')[0]"))
          .withColumn("b", expr("split(bigram, ' ')[1]"))
        bi
          .join(uni.select(col("tok").as("a"), col("cu").as("cua")), "a")
          .join(uni.select(col("tok").as("b"), col("cu").as("cub")), "b")
          .crossJoin(broadcast(totU)).crossJoin(broadcast(totB))
          .withColumn("pmi_millibits",
            round(lit(1000.0) * (log2(col("cb")) + lit(2.0) * log2(col("tu"))
              - log2(col("tb")) - log2(col("cua")) - log2(col("cub"))))
              .cast("long"))
          .select(col("bigram"), col("cb").as("n_cooccur"),
            col("cua"), col("cub"), col("pmi_millibits"))
          .orderBy(col("pmi_millibits").desc, col("bigram"))
          .limit(20)
      },
      Some {
        val ng2 = "list_transform(range(0, len(string_split(text, ' ')) - 1), " +
          "i -> array_to_string((string_split(text, ' '))[i+1:i+2], ' '))"
        s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
           |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM toks GROUP BY tok),
           |tu AS (SELECT CAST(sum(cu) AS BIGINT) AS tu FROM uni),
           |tb AS (SELECT CAST(sum(greatest(len(string_split(text, ' ')) - 1, 0)) AS BIGINT) AS tb
           |       FROM documents),
           |bi AS (SELECT bigram, CAST(count(*) AS BIGINT) AS cb
           |       FROM (SELECT unnest($ng2) AS bigram
           |             FROM documents WHERE len(string_split(text, ' ')) >= 2)
           |       GROUP BY bigram HAVING count(*) >= 5)
           |SELECT bigram, cb AS n_cooccur, ua.cu AS cua, ub.cu AS cub,
           |  CAST(round(1000.0 * (log2(cb) + 2.0 * log2(tu)
           |    - log2(tb) - log2(ua.cu) - log2(ub.cu))) AS BIGINT) AS pmi_millibits
           |FROM bi, uni ua, uni ub, tu, tb
           |WHERE string_split(bigram, ' ')[1] = ua.tok
           |  AND string_split(bigram, ' ')[2] = ub.tok
           |ORDER BY pmi_millibits DESC, bigram LIMIT 20""".stripMargin
      }),

    // Per-document unigram-LM surprisal — the perplexity proxy quality
    // filters use when a real LM is too expensive to run over the whole
    // corpus (high mean surprisal ⇒ rare-token-heavy / possibly noisy
    // doc; low ⇒ boilerplate). Numeric policy: each token's surprisal
    // log2(total/count) is quantized to integer millibits BEFORE the
    // per-doc sum, so the aggregate is an order-independent integer sum —
    // summing raw doubles across a shuffle would be non-associative and
    // hash-unstable by construction. Scale shape: one vocabulary
    // aggregate, one token-keyed join back to the token stream (the
    // standard scatter-gather LM scoring join), one per-doc aggregate;
    // nothing global except a 1-row total.
    QueryDef(
      "doc_unigram_surprisal",
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        val uni = toks.groupBy("tok").agg(count(lit(1)).as("cu"))
        val totU = uni.agg(sum(col("cu")).as("tu"))
        toks.join(uni, "tok")
          .crossJoin(broadcast(totU))
          .withColumn("surp",
            round(lit(1000.0) * (log2(col("tu")) - log2(col("cu")))).cast("long"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"), sum(col("surp")).as("surprisal_sum"))
          .withColumn("mean_surprisal_millibits",
            expr("surprisal_sum div n_toks"))
          .orderBy(col("mean_surprisal_millibits").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |              FROM documents),
             |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM toks GROUP BY tok),
             |tu AS (SELECT CAST(sum(cu) AS BIGINT) AS tu FROM uni),
             |scored AS (
             |  SELECT doc_id,
             |    CAST(round(1000.0 * (log2(tu) - log2(cu))) AS BIGINT) AS surp
             |  FROM toks JOIN uni USING (tok), tu)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
             |  CAST(sum(surp) AS BIGINT) AS surprisal_sum,
             |  CAST(CAST(sum(surp) AS BIGINT) // count(*) AS BIGINT) AS mean_surprisal_millibits
             |FROM scored GROUP BY doc_id
             |ORDER BY mean_surprisal_millibits DESC, doc_id LIMIT 20""".stripMargin)),

    // Zipf slope of the vocabulary head — the corpus-health scalar
    // (natural language sits near slope ≈ −1 on log rank vs log freq;
    // a flat head means boilerplate/duplication, a cliff means a
    // truncated vocab): OLS over the top-100 tokens' (log2 rank,
    // log2 freq). Numeric policy: both logs are quantized to integer
    // millibits per point, every OLS sum is then exact int64, and the
    // slope is emitted as the cross-multiplied num/den pair plus ONE
    // final double division — no accumulated FP. Scale shape: one
    // vocabulary aggregate; the rank window orders exactly 100 rows
    // (post-LIMIT), bounded at any corpus size.
    QueryDef(
      "zipf_slope_fit",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("tok"))
        val top = t(s, d, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("tok")).limit(100)
          .withColumn("rk", row_number().over(w).cast("long"))
          .select(
            round(lit(1000.0) * log2(col("rk"))).cast("long").as("x"),
            round(lit(1000.0) * log2(col("freq"))).cast("long").as("y"))
        top.agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
          .withColumn("slope",
            col("slope_num").cast("double") / col("slope_den").cast("double"))
      },
      Some("""WITH counts AS (
             |  SELECT tok, CAST(count(*) AS BIGINT) AS freq
             |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
             |  GROUP BY tok),
             |top AS (
             |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS BIGINT) AS rk,
             |         freq
             |  FROM (SELECT tok, freq FROM counts ORDER BY freq DESC, tok LIMIT 100)),
             |pts AS (
             |  SELECT CAST(round(1000.0 * log2(rk)) AS BIGINT) AS x,
             |         CAST(round(1000.0 * log2(freq)) AS BIGINT) AS y
             |  FROM top),
             |sums AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM pts)
             |SELECT n, n * sxy - sx * sy AS slope_num,
             |  n * sxx - sx * sx AS slope_den,
             |  CAST(n * sxy - sx * sy AS DOUBLE)
             |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
             |FROM sums""".stripMargin)),

    // One BPE merge step (tokenizer training): the 20 most frequent
    // ADJACENT CHARACTER PAIRS across the corpus, each word's pairs
    // weighted by the word's corpus frequency — the argmax pair is the
    // next merge a BPE trainer would apply. The scale trick is the
    // standard one: pair extraction runs over the DISTINCT-WORD
    // vocabulary (thousands of rows however big the corpus), with corpus
    // mass carried as an integer weight from one word-count aggregation —
    // the raw token stream is never re-scanned per merge iteration.
    QueryDef(
      "bpe_merge_step",
      (s, d) => {
        val wordFreq = t(s, d, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("word"))
          .groupBy("word").agg(count(lit(1)).as("wf"))
        wordFreq
          // single-char words carry no pairs; the filter also guards
          // Spark's sequence(1, 0), which DESCENDS instead of being empty
          .filter(length(col("word")) >= 2)
          .select(col("wf"), explode(expr(
            "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")).as("pair"))
          .groupBy("pair").agg(sum(col("wf")).as("freq"))
          .orderBy(col("freq").desc, col("pair"))
          .limit(20)
      },
      Some("""WITH wf AS (
             |  SELECT tok AS word, count(*) AS wf
             |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
             |  GROUP BY tok),
             |pairs AS (
             |  SELECT substr(word, CAST(i AS INT), 2) AS pair, wf
             |  FROM (SELECT word, wf, unnest(range(1, length(word))) AS i FROM wf))
             |SELECT pair, CAST(sum(wf) AS BIGINT) AS freq
             |FROM pairs GROUP BY pair
             |ORDER BY freq DESC, pair LIMIT 20""".stripMargin)),

    // Inverted-index build: token → document frequency + the first 20
    // postings (sorted doc_ids, serialized for the comparator) — the
    // retrieval-side artifact of a corpus (BM25/keyword search over
    // training data). The rank ≤ 20 cap compiles to WindowGroupLimit, so
    // each task keeps a 20-row heap per token and the collect_list only
    // ever sees ≤ 20 rows/token — posting lists never materialize
    // unbounded (the 100 TB discipline: production segments postings the
    // same way). df is a count over the SAME token partitioning, so the
    // window exchange is reused — distinct + one token shuffle total.
    QueryDef(
      "inverted_index_postings",
      (s, d) => {
        val wTok = org.apache.spark.sql.expressions.Window.partitionBy("tok")
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy("tok").orderBy("doc_id")
        t(s, d, "documents")
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
          .distinct()
          .withColumn("df", count(lit(1)).over(wTok))
          .withColumn("rn", row_number().over(wRank))
          .filter(col("rn") <= 20)
          .groupBy("tok", "df")
          .agg(array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings"))
          .select(col("tok"), col("df"), col("postings"))
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT doc_id, tok
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents))
             |SELECT tok, count(*) AS df,
             |  array_to_string(list_sort(list(doc_id))[1:20], ',') AS postings
             |FROM pairs GROUP BY tok""".stripMargin)),

    // Log-free TF-IDF: tf · (N/df) — exact double arithmetic (a log-based
    // idf would hinge on libm-vs-JVM last-ulp agreement; the ranking is
    // monotone-equivalent). Top 5 terms per doc for the first 50 docs.
    QueryDef(
      "text_tfidf_topterms",
      (s, d) => {
        val docs = t(s, d, "documents")
        val n = docs.agg(count(lit(1)).cast("double").as("n_docs")) // stays lazy — no driver count
        val tf = docs
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        // df derived from tf itself via a count window over token — the
        // corpus is tokenized exactly ONCE (a tf-join-df formulation
        // re-runs the explode+aggregate subtree per join side unless
        // exchange reuse happens to fire). The doc_id filter must stay
        // below this window: df counts the whole corpus.
        val wDf = org.apache.spark.sql.expressions.Window.partitionBy("token")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
        tf.withColumn("df", count(lit(1)).over(wDf))
          .crossJoin(broadcast(n))
          .withColumn("tfidf",
            col("tf").cast("double") * (col("n_docs") / col("df").cast("double")))
          .filter(col("doc_id") < 50)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("doc_id", "token", "tfidf", "rank")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, token, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
             |  GROUP BY doc_id, token),
             |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
             |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
             |scored AS (
             |  SELECT doc_id, tf.token,
             |         CAST(tf AS DOUBLE) * (n_docs / CAST(df AS DOUBLE)) AS tfidf
             |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
             |  WHERE doc_id < 50)
             |SELECT doc_id, token, tfidf, rank FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             |            ORDER BY tfidf DESC, token) AS rank
             |  FROM scored) WHERE rank <= 5""".stripMargin)),

    // IVF coarse quantization: assign every vector to its nearest centroid
    // (the first 8 vectors stand in for trained centroids). This is the
    // partitioning step of IVF ANN search: at 100 TB the corpus is
    // bucketed by centroid_id once, and queries probe 1-2 buckets.
    QueryDef(
      "sim_ivf_assign",
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))
        val cents = broadcast(emb.filter(col("id") < 8)
          .select(col("id").as("centroid_id"), col("vec").as("cvec"),
                  Similarity.l2Norm(col("vec")).as("cnorm")))
        val scored = emb
          .withColumn("vnorm", Similarity.l2Norm(col("vec")))
          .crossJoin(cents)
          .withColumn("sim", Similarity.dot(col("vec"), col("cvec")) /
            (col("vnorm") * col("cnorm")))
        // argmax as an aggregate, not a row_number window: partial (map-side)
        // aggregation shuffles ONE row per vector instead of nlist rows, and
        // drops the per-partition sort. The struct ordinal makes the
        // tie-break deterministic (highest sim, then lowest centroid_id) to
        // match the oracle's ROW_NUMBER ordering.
        scored.groupBy(col("id"))
          .agg(max_by(struct(col("centroid_id"), col("sim")),
            struct(col("sim"), (-col("centroid_id")).as("nc"))).as("best"))
          .select(col("id").as("vec_id"), col("best.centroid_id").as("centroid_id"),
                  col("best.sim").as("centroid_sim"))
      },
      Some { // mirrors the norm-precomputed arithmetic: dot/(vnorm*cnorm)
        val dotSql = "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
          "list_transform(range(1, len(%s) + 1), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE))), (acc, x) -> acc + x)"
        def dot(a: String, b: String) = dotSql.format(a, a, b)
        s"""WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cvec,
           |                      sqrt(${dot("embedding", "embedding")}) AS cnorm
           |               FROM embeddings WHERE vec_id < 8),
           |scored AS (
           |  SELECT e.vec_id, centroid_id,
           |         ${dot("e.embedding", "cvec")} /
           |           (sqrt(${dot("e.embedding", "e.embedding")}) * cnorm) AS sim
           |  FROM embeddings e CROSS JOIN cents)
           |SELECT vec_id, centroid_id, sim AS centroid_sim FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
           |            ORDER BY sim DESC, centroid_id) AS rn
           |  FROM scored) WHERE rn = 1""".stripMargin
      }),

    // One k-means update step: element-wise mean of each centroid's member
    // vectors — the training move between assign and probe, making the IVF
    // family self-contained (assign → retrain → probe). posexplode + one
    // shuffle on (centroid_id, pos) with map-side partial sums is the
    // deterministic distributed shape: summing whole vectors with an
    // aggregate HOF would add floats in shuffle order (nondeterministic);
    // the per-element DECIMAL(18,9) sum is order-independent and exact, so
    // the recomputed centroids go under the oracle hash gate.
    QueryDef(
      "sim_kmeans_step",
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))
        val cents = broadcast(emb.filter(col("id") < 8)
          .select(col("id").as("centroid_id"), col("vec").as("cvec"),
                  Similarity.l2Norm(col("vec")).as("cnorm")))
        val assigned = emb
          .withColumn("vnorm", Similarity.l2Norm(col("vec")))
          .crossJoin(cents)
          .withColumn("csim", Similarity.dot(col("vec"), col("cvec")) /
            (col("vnorm") * col("cnorm")))
          .groupBy(col("id"))
          .agg(max_by(struct(col("vec"), col("centroid_id")),
            struct(col("csim"), (-col("centroid_id")).as("nc"))).as("best"))
          .select(col("best.centroid_id").as("centroid_id"), col("best.vec").as("vec"))
        assigned
          .select(col("centroid_id"), posexplode(col("vec")))
          .groupBy(col("centroid_id"), col("pos").cast("long").as("pos"))
          .agg(count(lit(1)).as("n_members"),
            (sum(col("col").cast("double").cast("decimal(18,9)")).cast("double")
              / count(lit(1)).cast("double")).as("mean_val"))
      },
      Some {
        val dotSql = "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
          "list_transform(range(1, len(%s) + 1), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE))), (acc, x) -> acc + x)"
        def dot(a: String, b: String) = dotSql.format(a, a, b)
        s"""WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cvec,
           |                      sqrt(${dot("embedding", "embedding")}) AS cnorm
           |               FROM embeddings WHERE vec_id < 8),
           |assigned AS (
           |  SELECT centroid_id, vec FROM (
           |    SELECT e.embedding AS vec, centroid_id,
           |           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
           |             ${dot("e.embedding", "cvec")} /
           |               (sqrt(${dot("e.embedding", "e.embedding")}) * cnorm) DESC,
           |             centroid_id) AS rn
           |    FROM embeddings e CROSS JOIN cents) WHERE rn = 1),
           |p AS (SELECT unnest(range(0, 64)) AS pos)
           |SELECT centroid_id, pos, count(*) AS n_members,
           |  CAST(sum(CAST(CAST(vec[pos + 1] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
           |    / CAST(count(*) AS DOUBLE) AS mean_val
           |FROM assigned CROSS JOIN p GROUP BY 1, 2""".stripMargin
      }),

    // Three full Lloyd iterations of k-means (k = 8, seeded from the
    // first 8 vectors) — the embedding-side multi-round iterative
    // operator, completing the trio with pagerank_power_k5 and
    // graph_bfs_hops_k3: assign (broadcast argmax over the 8 centroids,
    // one shuffled row per vector via max_by) -> update (per-dimension
    // NANO-QUANTIZED means: each component contributes
    // round(v*1e9) BIGINT, the mean is one double division + round, so
    // the centroid update is FP-order-free and engine-exact; `div` is
    // deliberately avoided because component sums go negative and
    // Spark's div truncates where DuckDB's // floors) -> rebuild the
    // centroid arrays and repeat. Per round the corpus is scanned once
    // and only (vector, centroid) argmax rows shuffle; the 8x64 centroid
    // table is localCheckpoint-pinned between rounds so round k never
    // re-expands rounds 1..k-1 (the pagerank lineage discipline). The
    // oracle replays all three rounds as chained CTEs.
    QueryDef(
      "kmeans_lloyd_k3",
      (s, d) => {
        val emb = t(s, d, "embeddings")
          .select(col("vec_id").as("id"),
            transform(col("embedding"), x => x.cast("double")).as("vec"))
        var cents = emb.filter(col("id") < 8)
          .select(col("id").as("centroid_id"), col("vec").as("cvec"))
          .localCheckpoint(true)
        var means: org.apache.spark.sql.DataFrame = null
        for (r <- 1 to 3) {
          val cb = broadcast(cents.withColumn("cnorm", Similarity.l2Norm(col("cvec"))))
          val assigned = emb
            .withColumn("vnorm", Similarity.l2Norm(col("vec")))
            .crossJoin(cb)
            .withColumn("csim", Similarity.dot(col("vec"), col("cvec")) /
              (col("vnorm") * col("cnorm")))
            .groupBy(col("id"))
            .agg(max_by(struct(col("vec"), col("centroid_id")),
              struct(col("csim"), (-col("centroid_id")).as("nc"))).as("best"))
            .select(col("best.centroid_id").as("centroid_id"), col("best.vec").as("vec"))
          means = assigned
            .select(col("centroid_id"), posexplode(col("vec")))
            .groupBy(col("centroid_id"), col("pos").cast("long").as("pos"))
            .agg(count(lit(1)).as("n_members"),
              expr("CAST(round(CAST(sum(CAST(round(col * 1e9) AS BIGINT)) AS DOUBLE) " +
                "/ count(1)) AS BIGINT)").as("mean_nano"))
          if (r < 3) {
            cents = means.groupBy("centroid_id")
              .agg(transform(
                array_sort(collect_list(struct(col("pos"), col("mean_nano")))),
                x => x.getField("mean_nano").cast("double") / lit(1e9)).as("cvec"))
              .localCheckpoint(true)
          }
        }
        means.orderBy("centroid_id", "pos")
      },
      Some {
        val dotSql = "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
          "list_transform(range(1, len(%s) + 1), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE))), (acc, x) -> acc + x)"
        def dot(a: String, b: String) = dotSql.format(a, a, b)
        def round(prev: String, r: Int): String =
          s"""a$r AS (
             |  SELECT centroid_id, vec FROM (
             |    SELECT e.vec AS vec, c.centroid_id,
             |      ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
             |        ${dot("e.vec", "c.cvec")} /
             |          (sqrt(${dot("e.vec", "e.vec")}) * sqrt(${dot("c.cvec", "c.cvec")})) DESC,
             |        c.centroid_id) AS rn
             |    FROM emb e CROSS JOIN $prev c) WHERE rn = 1),
             |m$r AS (
             |  SELECT centroid_id, pos, count(*) AS n_members,
             |    CAST(round(CAST(sum(CAST(round(vec[pos + 1] * 1e9) AS BIGINT)) AS DOUBLE)
             |      / count(*)) AS BIGINT) AS mean_nano
             |  FROM a$r CROSS JOIN p GROUP BY 1, 2),
             |c$r AS (SELECT centroid_id, list(mean_nano / 1e9 ORDER BY pos) AS cvec
             |        FROM m$r GROUP BY 1)""".stripMargin
        s"""WITH emb AS (
           |  SELECT vec_id AS id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
           |  FROM embeddings),
           |c0 AS (SELECT id AS centroid_id, vec AS cvec FROM emb WHERE id < 8),
           |p AS (SELECT unnest(range(0, 64)) AS pos),
           |${round("c0", 1)},
           |${round("c1", 2)},
           |${round("c2", 3)}
           |SELECT centroid_id, pos, CAST(n_members AS BIGINT) AS n_members,
           |  mean_nano
           |FROM m3 ORDER BY centroid_id, pos""".stripMargin
      }),

    // IVF probe search: queries scored only against their own centroid's
    // bucket — the sub-linear ANN path (scan cost /= nlist). Recall < 1 by
    // construction; the oracle replays the identical two-stage plan so the
    // approximation itself is hash-checked.
    QueryDef(
      "sim_ivf_topk",
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))
        val cents = broadcast(emb.filter(col("id") < 8)
          .select(col("id").as("centroid_id"), col("vec").as("cvec"),
                  Similarity.l2Norm(col("vec")).as("cnorm")))
        // argmax-by-aggregation (see sim_ivf_assign): one shuffled row per
        // vector; the vector payload rides in the max_by value struct
        def assign(df: org.apache.spark.sql.DataFrame) =
          df.withColumn("vnorm", Similarity.l2Norm(col("vec")))
            .crossJoin(cents)
            .withColumn("csim", Similarity.dot(col("vec"), col("cvec")) /
              (col("vnorm") * col("cnorm")))
            .groupBy(col("id"))
            .agg(max_by(struct(col("vec"), col("vnorm"), col("centroid_id")),
              struct(col("csim"), (-col("centroid_id")).as("nc"))).as("best"))
            .select(col("id"), col("best.vec").as("vec"),
                    col("best.vnorm").as("vnorm"), col("best.centroid_id").as("centroid_id"))
        val corpus = assign(emb)
        // query side = the already-assigned corpus, filtered — not a second
        // assign() over a filtered scan. The id<10 predicate pushes below
        // the argmax aggregation (id is the grouping key), so the broadcast
        // side scores only the 10 query vectors, and the query definition
        // has exactly one assignment subtree.
        val queries = broadcast(corpus.filter(col("id") < 10)
          .select(col("id").as("query_id"), col("vec").as("qvec"),
                  col("vnorm").as("qnorm"), col("centroid_id")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("cosine_sim").desc, col("id"))
        corpus.join(queries, "centroid_id")
          .filter(col("query_id") =!= col("id"))
          .withColumn("cosine_sim", Similarity.dot(col("qvec"), col("vec")) /
            (col("qnorm") * col("vnorm")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("id").as("neighbor_id"), col("cosine_sim"), col("rank"))
      },
      Some {
        val dotSql = "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
          "list_transform(range(1, len(%s) + 1), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE))), (acc, x) -> acc + x)"
        def dot(a: String, b: String) = dotSql.format(a, a, b)
        s"""WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cvec,
           |                      sqrt(${dot("embedding", "embedding")}) AS cnorm
           |               FROM embeddings WHERE vec_id < 8),
           |assigned AS (
           |  SELECT id, vec, vnorm, centroid_id FROM (
           |    SELECT e.vec_id AS id, e.embedding AS vec,
           |           sqrt(${dot("e.embedding", "e.embedding")}) AS vnorm,
           |           centroid_id,
           |           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
           |             ${dot("e.embedding", "cvec")} /
           |               (sqrt(${dot("e.embedding", "e.embedding")}) * cnorm) DESC,
           |             centroid_id) AS rn
           |    FROM embeddings e CROSS JOIN cents) WHERE rn = 1),
           |scored AS (
           |  SELECT q.id AS query_id, c.id AS neighbor_id,
           |         ${dot("q.vec", "c.vec")} / (q.vnorm * c.vnorm) AS cosine_sim
           |  FROM assigned q JOIN assigned c ON q.centroid_id = c.centroid_id
           |  WHERE q.id < 10 AND c.id != q.id)
           |SELECT query_id, neighbor_id, cosine_sim, rank FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           |            ORDER BY cosine_sim DESC, neighbor_id) AS rank
           |  FROM scored) WHERE rank <= 5""".stripMargin
      }),

    // Persisted IVF index probe (r8 verdict task #7 — the production
    // retrieval path, not just a per-query plan): the IVF assignment
    // (id, vec, vnorm, centroid_id) is materialized ONCE as a table
    // BUCKETED and sorted by centroid_id (the bucketed_join_colocated
    // machinery), and the probe consumes the bucket files directly — the
    // tiny query set broadcasts onto the index scan, so there are ZERO
    // shuffle exchanges under the probe join (pinned in PlanSpec). At
    // 100 TB this is the difference between re-assigning and re-shuffling
    // the corpus per query batch and a pure broadcast-probe of a
    // co-located index; the index build is the one-off a lake writer
    // declares, every retrieval inherits the layout. Results (and the
    // oracle) are identical to sim_ivf_topk — same ANN semantics, the
    // physical path is the point.
    QueryDef(
      "sim_ivf_persisted_topk",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]+", "_")
        val idx = s"graft_ivf_idx_$tag"
        AnalyticsQueries.ensureBucketedTable(s, idx, "centroid_id", {
          val emb = t(s, d, "embeddings")
            .select(col("vec_id").as("id"), col("embedding").as("vec"))
          val cents = broadcast(emb.filter(col("id") < 8)
            .select(col("id").as("centroid_id"), col("vec").as("cvec"),
                    Similarity.l2Norm(col("vec")).as("cnorm")))
          emb.withColumn("vnorm", Similarity.l2Norm(col("vec")))
            .crossJoin(cents)
            .withColumn("csim", Similarity.dot(col("vec"), col("cvec")) /
              (col("vnorm") * col("cnorm")))
            .groupBy(col("id"))
            .agg(max_by(struct(col("vec"), col("vnorm"), col("centroid_id")),
              struct(col("csim"), (-col("centroid_id")).as("nc"))).as("best"))
            .select(col("id"), col("best.vec").as("vec"),
                    col("best.vnorm").as("vnorm"),
                    col("best.centroid_id").as("centroid_id"))
        })
        val corpus = s.table(idx)
        val queries = broadcast(corpus.filter(col("id") < 10)
          .select(col("id").as("query_id"), col("vec").as("qvec"),
                  col("vnorm").as("qnorm"), col("centroid_id")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("cosine_sim").desc, col("id"))
        corpus.join(queries, "centroid_id")
          .filter(col("query_id") =!= col("id"))
          .withColumn("cosine_sim", Similarity.dot(col("qvec"), col("vec")) /
            (col("qnorm") * col("vnorm")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("id").as("neighbor_id"),
                  col("cosine_sim"), col("rank"))
      },
      Some {
        val dotSql = "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
          "list_transform(range(1, len(%s) + 1), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE))), (acc, x) -> acc + x)"
        def dot(a: String, b: String) = dotSql.format(a, a, b)
        s"""WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cvec,
           |                      sqrt(${dot("embedding", "embedding")}) AS cnorm
           |               FROM embeddings WHERE vec_id < 8),
           |assigned AS (
           |  SELECT id, vec, vnorm, centroid_id FROM (
           |    SELECT e.vec_id AS id, e.embedding AS vec,
           |           sqrt(${dot("e.embedding", "e.embedding")}) AS vnorm,
           |           centroid_id,
           |           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
           |             ${dot("e.embedding", "cvec")} /
           |               (sqrt(${dot("e.embedding", "e.embedding")}) * cnorm) DESC,
           |             centroid_id) AS rn
           |    FROM embeddings e CROSS JOIN cents) WHERE rn = 1),
           |scored AS (
           |  SELECT q.id AS query_id, c.id AS neighbor_id,
           |         ${dot("q.vec", "c.vec")} / (q.vnorm * c.vnorm) AS cosine_sim
           |  FROM assigned q JOIN assigned c ON q.centroid_id = c.centroid_id
           |  WHERE q.id < 10 AND c.id != q.id)
           |SELECT query_id, neighbor_id, cosine_sim, rank FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           |            ORDER BY cosine_sim DESC, neighbor_id) AS rank
           |  FROM scored) WHERE rank <= 5""".stripMargin
      }),

    // Corpus-duplicated-n-gram fraction — the RefinedWeb/Dolma corpus-level
    // repetition filter (text_repetition_ratio is the WITHIN-document
    // Gopher variant): per document, the fraction of its distinct trigram
    // shingles that occur in >= 3 documents corpus-wide. One explode, one
    // shuffle keyed on the shingle (the count-over-window reuses that
    // exchange for the document re-aggregation input — same tokenize-once
    // discipline as text_tfidf_topterms), then a per-doc hash agg. At
    // 100 TB the shingle exchange is the same cardinality as exact dedup's
    // digest shuffle; nothing is quadratic and no side is collected.
    QueryDef(
      "corpus_dup_ngram_frac",
      (s, d) => {
        val wNg = org.apache.spark.sql.expressions.Window.partitionBy("ng")
        t(s, d, "documents")
          .select(col("doc_id"),
            explode(graft.dedup.Dedup.shingleSet(col("text"), 3)).as("ng"))
          .withColumn("ndocs", count(lit(1)).over(wNg))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("total_ngrams"),
            sum(when(col("ndocs") >= 3, 1L).otherwise(0L)).as("dup_ngrams"))
          .withColumn("dup_frac",
            col("dup_ngrams").cast("double") / col("total_ngrams").cast("double"))
      },
      Some {
        val ng3 = "list_transform(range(0, len(string_split(text, ' ')) - 2), " +
          "i -> array_to_string((string_split(text, ' '))[i+1:i+3], ' '))"
        s"""WITH sh AS (SELECT doc_id, unnest(list_distinct($ng3)) AS ng
           |            FROM documents),
           |c AS (SELECT doc_id, count(*) OVER (PARTITION BY ng) AS ndocs FROM sh)
           |SELECT doc_id, count(*) AS total_ngrams,
           |  CAST(sum(CASE WHEN ndocs >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS dup_ngrams,
           |  CAST(sum(CASE WHEN ndocs >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
           |    / CAST(count(*) AS DOUBLE) AS dup_frac
           |FROM c GROUP BY doc_id""".stripMargin
      }),

    // Token-familiarity profile — the perplexity-proxy quality screen
    // (CCNet-style) kept integer-exact instead of log-probability FP: per
    // document, the minimum and mean CORPUS frequency of its tokens. A
    // low mean marks out-of-distribution documents; min_cf = 1 marks
    // documents carrying hapax tokens (rare_token_docs lists the tokens
    // themselves; this is the per-document roll-up). Same single-tokenize
    // count-over-window shape as corpus_dup_ngram_frac; the mean is an
    // exact-integer sum divided once, so the double is engine-identical.
    QueryDef(
      "token_freq_profile",
      (s, d) => {
        val wT = org.apache.spark.sql.expressions.Window.partitionBy("token")
        t(s, d, "documents")
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
          .withColumn("cf", count(lit(1)).over(wT))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            min(col("cf")).as("min_cf"),
            (sum(col("cf")).cast("double") / count(lit(1)).cast("double"))
              .as("mean_cf"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |  FROM documents),
             |c AS (SELECT doc_id, count(*) OVER (PARTITION BY token) AS cf FROM tok)
             |SELECT doc_id, count(*) AS n_tokens,
             |  min(cf) AS min_cf,
             |  CAST(sum(cf) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_cf
             |FROM c GROUP BY doc_id""".stripMargin)),

    // Cross-source overlap matrix — the mixing diagnostic run before
    // blending corpora: trigram-shingle Jaccard between every source
    // pair. The join is keyed on the shingle; a shingle appearing in k
    // sources expands to k·(k-1)/2 pair rows, bounded by (#sources choose
    // 2) — a CATALOG constant, independent of corpus size — so the
    // shuffle stays proportional to the distinct (source, shingle) set
    // (the same cardinality class as exact dedup). Set sizes broadcast
    // back for the exact-rational Jaccard.
    QueryDef(
      "source_overlap_matrix",
      (s, d) => {
        // n-grams ride as 60-bit md5 ids (the simjoin_prefix_filter
        // discipline): the distinct and the cross-source self-join — this
        // query's whole exchange volume — move 8-byte longs instead of
        // ~20-byte n-gram strings; md5 is engine-identical so the oracle
        // replays the ids (and any ~1e-6 collision) exactly
        val sets = t(s, d, "documents")
          .select(col("source"),
            explode(graft.dedup.Dedup.shingleSet(col("text"), 3)).as("ng"))
          .select(col("source"),
            conv(substring(md5(col("ng")), 1, 15), 16, 10)
              .cast("long").as("ngid"))
          .distinct()
        val sizes = sets.groupBy("source").agg(count(lit(1)).as("sz"))
        val shared = sets.select(col("source").as("src_a"), col("ngid"))
          .join(sets.select(col("source").as("src_b"), col("ngid")), "ngid")
          .filter(col("src_a") < col("src_b"))
          .groupBy("src_a", "src_b")
          .agg(count(lit(1)).as("n_shared"))
        shared
          .join(broadcast(sizes.select(col("source").as("src_a"), col("sz").as("sz_a"))), "src_a")
          .join(broadcast(sizes.select(col("source").as("src_b"), col("sz").as("sz_b"))), "src_b")
          .select(col("src_a"), col("src_b"), col("n_shared"), col("sz_a"), col("sz_b"),
            (col("n_shared").cast("double") /
              (col("sz_a") + col("sz_b") - col("n_shared")).cast("double")).as("jaccard"))
      },
      Some {
        val ng3 = "list_transform(range(0, len(string_split(text, ' ')) - 2), " +
          "i -> array_to_string((string_split(text, ' '))[i+1:i+3], ' '))"
        s"""WITH sets AS (
           |  SELECT DISTINCT source,
           |    CAST(('0x' || substr(md5(ng), 1, 15)) AS BIGINT) AS ngid
           |  FROM (SELECT source, unnest(list_distinct($ng3)) AS ng
           |        FROM documents)),
           |sizes AS (SELECT source, count(*) AS sz FROM sets GROUP BY 1),
           |shared AS (
           |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
           |  FROM sets a JOIN sets b ON a.ngid = b.ngid AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT src_a, src_b, n_shared, sa.sz AS sz_a, sb.sz AS sz_b,
           |  CAST(n_shared AS DOUBLE) /
           |    CAST(sa.sz + sb.sz - n_shared AS DOUBLE) AS jaccard
           |FROM shared
           |JOIN sizes sa ON shared.src_a = sa.source
           |JOIN sizes sb ON shared.src_b = sb.source""".stripMargin
      }),

    // Kneser-Ney continuation counts — the lower-order distribution an
    // n-gram language model is trained on: per word, how many DISTINCT
    // left contexts it follows (N1+(•w)) next to its raw occurrence
    // count. "the" is frequent but predictable (few novel contexts);
    // KN smoothing weights by context diversity instead of frequency.
    // One bigram explode (the codegen shingle kernel), one aggregation
    // keyed on the word — the count-distinct shuffles (w1, w2) pairs,
    // the same cardinality class as the distinct-bigram vocabulary.
    // Integer-exact throughout; top-100 fully tie-broken.
    QueryDef(
      "kn_continuation_counts",
      (s, d) => t(s, d, "documents")
        .select(explode(graft.dedup.Dedup.shingles(col("text"), 2)).as("bg"))
        .select(split(col("bg"), " ").as("p"))
        .select(element_at(col("p"), 1).as("w1"), element_at(col("p"), 2).as("w2"))
        .groupBy(col("w2").as("word"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("w1")).as("n_contexts"))
        .orderBy(col("n_contexts").desc, col("n_occurrences").desc, col("word"))
        .limit(100),
      Some {
        val ng2 = "list_transform(range(0, len(string_split(text, ' ')) - 1), " +
          "i -> array_to_string((string_split(text, ' '))[i+1:i+2], ' '))"
        s"""WITH bg AS (SELECT unnest($ng2) AS b FROM documents),
           |pairs AS (SELECT string_split(b, ' ')[1] AS w1,
           |                 string_split(b, ' ')[2] AS w2 FROM bg)
           |SELECT w2 AS word, count(*) AS n_occurrences,
           |  count(DISTINCT w1) AS n_contexts
           |FROM pairs GROUP BY w2
           |ORDER BY n_contexts DESC, n_occurrences DESC, word LIMIT 100""".stripMargin
      }),

    // Heavy hitters (frequency > N/200) by two-phase Misra-Gries: each
    // partition summarizes its token stream with k=256 bounded counters
    // (the classic streaming sketch — Misra & Gries 1982), and only the
    // surviving CANDIDATES are exact-counted and filtered against the
    // global threshold. Soundness: freq > N/200 globally forces freq >
    // n_p/200 in at least one partition (weighted average), and MG with
    // k=256 > 200 counters keeps any token with local freq > n_p/(k+1) —
    // so the candidate union is a guaranteed superset of the true heavy
    // hitters, and the final exact filter makes the output independent of
    // partitioning. Scale shape: the LONG TAIL NEVER SHUFFLES — the only
    // shuffled tokens are the ≤ 256·partitions candidates (semi-join
    // broadcast), vs a full groupBy shuffling every distinct token. This
    // is the honest mapPartitions case: per-partition bounded mutable
    // state no declarative operator expresses. The oracle recomputes the
    // naive full groupBy — equality proves the sketch's superset logic.
    QueryDef(
      "heavy_hitters_misra_gries",
      (s, d) => {
        import s.implicits._
        val toks = t(s, d, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
        val total = broadcast(toks.agg(count(lit(1)).as("n_total")))
        val candidates = broadcast(toks.as[String].mapPartitions { it =>
          val k = 256
          val counters = scala.collection.mutable.HashMap.empty[String, Long]
          it.foreach { tok =>
            if (counters.contains(tok)) counters(tok) += 1L
            else if (counters.size < k) counters(tok) = 1L
            else {
              counters.mapValuesInPlace((_, v) => v - 1L)
              counters.filterInPlace((_, v) => v > 0L)
            }
          }
          counters.keysIterator
        }.toDF("tok").distinct())
        toks.join(candidates, Seq("tok"), "left_semi")
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
          .join(total)
          .filter(col("cnt") * lit(200L) > col("n_total"))
          .select(col("tok"), col("cnt"))
          .orderBy("tok")
      },
      Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok),
             |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY tok)
             |SELECT tok, cnt FROM c CROSS JOIN tot
             |WHERE cnt * 200 > n_total ORDER BY tok""".stripMargin)),

    // BM25 document ranking for a fixed 3-term query — the standard
    // retrieval scorer next to text_tfidf_topterms, with the same ln-free
    // ratio idf (n/df) so no cross-engine transcendental enters the
    // score. Every input to the saturation arithmetic is an exact integer
    // (tf, df, dl, corpus totals); the per-term scores combine in a FIXED
    // pivot order (s1+s2+s3 — never a data-ordered float sum), and the
    // ranking key is the ×1e9-quantized integer, the knn_label_vote
    // tie-proofing. Scale: the corpus tokenizes once; only rows for the
    // query's terms survive the filter (at 100 TB this is the inverted-
    // index probe — postings for 3 terms, never the corpus); df and the
    // corpus stats broadcast.
    QueryDef(
      "bm25_topk",
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
          sum(col("dl")).cast("double").as("tot_tokens"))
        val tf = toks.filter(col("tok").isin("vector", "merge", "dup"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dfr = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val scored = tf.join(broadcast(dfr), "tok").join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("tscore",
            (col("n_docs") / col("df").cast("double")) *
            (col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) *
              (lit(0.25) + lit(0.75) * col("dl").cast("double") /
                (col("tot_tokens") / col("n_docs")))))
        scored.groupBy("doc_id").agg(
            sum(when(col("tok") === "vector", col("tscore"))).as("s1"),
            sum(when(col("tok") === "merge", col("tscore"))).as("s2"),
            sum(when(col("tok") === "dup", col("tscore"))).as("s3"))
          .select(col("doc_id"),
            round((coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0)) +
              coalesce(col("s3"), lit(0.0))) * lit(1e9)).cast("long").as("score_q"))
          .orderBy(col("score_q").desc, col("doc_id")).limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
             |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             |            CAST(sum(dl) AS DOUBLE) AS tot_tokens FROM dl),
             |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks
             |       WHERE tok IN ('vector', 'merge', 'dup') GROUP BY 1, 2),
             |dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
             |scored AS (
             |  SELECT tf.doc_id, tf.tok,
             |    (n_docs / CAST(df AS DOUBLE)) *
             |    (CAST(tf AS DOUBLE) * 2.2) /
             |    (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) /
             |      (tot_tokens / n_docs))) AS tscore
             |  FROM tf JOIN dfr USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats),
             |piv AS (
             |  SELECT doc_id,
             |    sum(CASE WHEN tok = 'vector' THEN tscore END) AS s1,
             |    sum(CASE WHEN tok = 'merge' THEN tscore END) AS s2,
             |    sum(CASE WHEN tok = 'dup' THEN tscore END) AS s3
             |  FROM scored GROUP BY 1)
             |SELECT doc_id,
             |  CAST(round((COALESCE(s1, 0.0) + COALESCE(s2, 0.0) +
             |    COALESCE(s3, 0.0)) * 1e9) AS BIGINT) AS score_q
             |FROM piv ORDER BY score_q DESC, doc_id LIMIT 20""".stripMargin)),

    // Pseudo-relevance-feedback query expansion (Rocchio-style PRF — the
    // classic two-stage retrieval loop RAG stacks rediscovered): stage 1
    // retrieves top-10 docs for the seed term; stage 2 mines those docs
    // for the 5 highest TF-IDF expansion terms (corpus-wide IDF, seed
    // excluded); stage 3 re-retrieves with the expanded 6-term query.
    // Every ranking is nano-quantized-integer (round(tf·idf·1e9)) with
    // doc/token tiebreaks, so the three stages are engine-exact
    // end-to-end. Scale shape: the only corpus-wide exchanges are the
    // vocabulary df aggregate and the final 6-term postings filter
    // (terms filtered BEFORE the shuffle); the feedback-doc token pool
    // and the expansion set are 10-doc / 6-term bounded broadcasts.
    QueryDef(
      "search_prf_expansion",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
        val toks = t(s, d, "documents")
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        val dfr = toks.select("doc_id", "tok").distinct()
          .groupBy("tok").agg(count(lit(1)).as("df"))
        val nDocs = broadcast(toks.select("doc_id").distinct()
          .agg(count(lit(1)).as("n_docs")))
        val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        def nanoScore = round(col("tf").cast("double") *
          (col("n_docs").cast("double") / col("df").cast("double")) * lit(1e9))
          .cast("long")
        val seedScored = tf.filter(col("tok") === "vector")
          .join(broadcast(dfr.filter(col("tok") === "vector")), Seq("tok"))
          .join(nDocs)
          .withColumn("sq", nanoScore)
          .orderBy(col("sq").desc, col("doc_id")).limit(10)
          .select(col("doc_id"), col("sq").as("seed_score"))
        val fb = broadcast(seedScored.select("doc_id"))
        val expansion = tf.join(fb, Seq("doc_id"))
          .filter(col("tok") =!= "vector")
          .groupBy("tok").agg(sum(col("tf")).as("tf_fb"))
          .join(dfr, Seq("tok")).join(nDocs)
          .withColumn("esq", round(col("tf_fb").cast("double") *
            (col("n_docs").cast("double") / col("df").cast("double")) * lit(1e9))
            .cast("long"))
          .orderBy(col("esq").desc, col("tok")).limit(5)
          .select("tok")
        val qterms = broadcast(expansion
          .unionByName(seedScored.sparkSession.range(1)
            .select(lit("vector").as("tok"))))
        tf.join(qterms, Seq("tok"))
          .join(broadcast(dfr), Seq("tok")).join(nDocs)
          .withColumn("sq", nanoScore)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_terms_hit"), sum(col("sq")).as("prf_score_nano"))
          .orderBy(col("prf_score_nano").desc, col("doc_id")).limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |dfr AS (
             |  SELECT tok, CAST(count(*) AS BIGINT) AS df
             |  FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY 1),
             |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks),
             |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
             |       FROM toks GROUP BY 1, 2),
             |seed AS (
             |  SELECT doc_id FROM (
             |    SELECT tf.doc_id,
             |      CAST(round(CAST(tf AS DOUBLE)
             |        * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1e9)
             |        AS BIGINT) AS sq
             |    FROM tf JOIN dfr USING (tok) CROSS JOIN nd
             |    WHERE tf.tok = 'vector')
             |  ORDER BY sq DESC, doc_id LIMIT 10),
             |expansion AS (
             |  SELECT tok FROM (
             |    SELECT t.tok,
             |      CAST(round(CAST(sum(t.tf) AS DOUBLE)
             |        * (CAST(max(n_docs) AS DOUBLE) / CAST(max(df) AS DOUBLE)) * 1e9)
             |        AS BIGINT) AS esq
             |    FROM tf t JOIN seed USING (doc_id)
             |    JOIN dfr ON dfr.tok = t.tok CROSS JOIN nd
             |    WHERE t.tok <> 'vector'
             |    GROUP BY t.tok)
             |  ORDER BY esq DESC, tok LIMIT 5),
             |qterms AS (SELECT tok FROM expansion UNION ALL SELECT 'vector')
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
             |  CAST(sum(CAST(round(CAST(tf AS DOUBLE)
             |    * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1e9) AS BIGINT))
             |    AS BIGINT) AS prf_score_nano
             |FROM tf JOIN qterms USING (tok) JOIN dfr USING (tok) CROSS JOIN nd
             |GROUP BY doc_id
             |ORDER BY prf_score_nano DESC, doc_id LIMIT 20""".stripMargin)),

    // Conjunctive multi-term retrieval (AND of three terms) — the
    // postings-intersection read every search/RAG stack runs. Spark side is
    // the scale path: explode tokens, FILTER TO THE QUERY TERMS BEFORE the
    // shuffle (postings-sized exchange, not corpus-sized), then one
    // map-side-combined conditional aggregate per doc with a HAVING on all
    // three counts. The oracle scans per-row (engine-idiomatic for DuckDB);
    // results are exact integer counts either way.
    QueryDef(
      "search_conjunctive_terms",
      (s, d) => {
        val hits = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w").isin("join", "hash", "vector"))
        hits.groupBy("doc_id")
          .agg(
            sum(when(col("w") === "join", 1L).otherwise(0L)).as("n_join"),
            sum(when(col("w") === "hash", 1L).otherwise(0L)).as("n_hash"),
            sum(when(col("w") === "vector", 1L).otherwise(0L)).as("n_vector"))
          .filter(col("n_join") > 0 && col("n_hash") > 0 && col("n_vector") > 0)
          .orderBy("doc_id")
      },
      Some("""WITH c AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), w -> w = 'join')) AS BIGINT) AS n_join,
             |    CAST(len(list_filter(string_split(text, ' '), w -> w = 'hash')) AS BIGINT) AS n_hash,
             |    CAST(len(list_filter(string_split(text, ' '), w -> w = 'vector')) AS BIGINT) AS n_vector
             |  FROM documents)
             |SELECT doc_id, n_join, n_hash, n_vector FROM c
             |WHERE n_join > 0 AND n_hash > 0 AND n_vector > 0
             |ORDER BY doc_id""".stripMargin)),

    // Positional phrase search ("fast join") — the phrase leg of the same
    // search surface, via POSITIONAL postings: posexplode tokens, keep only
    // the two phrase terms (again: filter before the shuffle), and join
    // term-1 positions to term-2 positions at offset +1 within each doc.
    // At 100 TB the join inputs are the two terms' postings lists — tiny
    // against the corpus — co-hashed on doc_id.
    QueryDef(
      "search_phrase_positional",
      (s, d) => {
        val tk = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        val first = tk.filter(col("w") === "fast")
          .select(col("doc_id"), col("pos"))
        val second = tk.filter(col("w") === "join")
          .select(col("doc_id").as("doc_id_b"), col("pos").as("pos_b"))
        first.join(second,
            col("doc_id") === col("doc_id_b") && col("pos_b") === col("pos") + 1)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_occurrences"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |c AS (
             |  SELECT doc_id, CAST(len(list_filter(range(0, len(ts) - 1),
             |    i -> ts[i + 1] = 'fast' AND ts[i + 2] = 'join')) AS BIGINT)
             |    AS n_occurrences
             |  FROM tk)
             |SELECT doc_id, n_occurrences FROM c
             |WHERE n_occurrences > 0 ORDER BY doc_id""".stripMargin)),

    // Per-document n-gram NOVELTY: the fraction of a doc's distinct
    // 3-gram shingles whose corpus-wide FIRST appearance (min doc_id,
    // the ingestion-order proxy) is this document. The curriculum /
    // crawl-health trend: novelty collapsing toward zero means the crawl
    // is re-reading itself; corpus_dup_ngram_frac counts how duplicated a
    // doc is, this counts how much NEW text it contributes. Same scale
    // class as exact dedup: one shingle-keyed window (min over the
    // posting) — never a self-join; counts exact int64, one final
    // division.
    QueryDef(
      "ngram_novelty_rate",
      (s, d) => {
        val wNg = org.apache.spark.sql.expressions.Window.partitionBy("ng")
        t(s, d, "documents")
          .select(col("doc_id"),
            explode(graft.dedup.Dedup.shingleSet(col("text"), 3)).as("ng"))
          .withColumn("first_doc", min("doc_id").over(wNg))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_ngrams"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .withColumn("novelty_frac",
            col("n_novel").cast("double") / col("n_ngrams").cast("double"))
          .orderBy("doc_id")
      },
      Some {
        val ng3 = "list_transform(range(0, len(string_split(text, ' ')) - 2), " +
          "i -> array_to_string((string_split(text, ' '))[i+1:i+3], ' '))"
        s"""WITH sh AS (SELECT doc_id, unnest(list_distinct($ng3)) AS ng
           |            FROM documents),
           |f AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY ng) AS first_doc
           |      FROM sh)
           |SELECT doc_id, count(*) AS n_ngrams,
           |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_novel,
           |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
           |    / CAST(count(*) AS DOUBLE) AS novelty_frac
           |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    // lists — the hybrid-search merge every lexical+vector stack runs:
    // list A ranks by query-term frequency (the bm25_topk term set),
    // list B by a query-independent authority prior (document length
    // here — the static-prior slot). RRF's 1/(60+rank) is kept EXACT by
    // integer division in ppm units (1000000 div (60+rank)) instead of
    // summing fractions in floating point, so ties and order are
    // bit-stable on both engines. Scale: both lists are top-50
    // WindowGroupLimit-class selections, the fusion is a 50+50-row full
    // outer join — the corpus is never joined to itself.
    QueryDef(
      "hybrid_rrf_fusion",
      (s, d) => {
        val docs = t(s, d, "documents")
        val tfSum = docs
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
          .filter(col("tok").isin("vector", "merge", "dup"))
          .groupBy("doc_id").agg(count(lit(1)).as("tf_sum"))
        val listA = tfSum
          .orderBy(col("tf_sum").desc, col("doc_id")).limit(50)
          .select(col("doc_id"),
            row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("tf_sum").desc, col("doc_id")))
              .cast("long").as("rank_a"))
        val listB = docs
          .orderBy(col("n_chars").desc, col("doc_id")).limit(50)
          .select(col("doc_id"),
            row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("n_chars").desc, col("doc_id")))
              .cast("long").as("rank_b"))
        listA.join(listB, Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("rank_a"), col("rank_b"),
            (coalesce(expr("1000000L div (60 + rank_a)"), lit(0L)) +
             coalesce(expr("1000000L div (60 + rank_b)"), lit(0L))).as("rrf_ppm"))
          .orderBy(col("rrf_ppm").desc, col("doc_id")).limit(20)
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, count(*) AS tf_sum
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  WHERE tok IN ('vector', 'merge', 'dup')
             |  GROUP BY doc_id),
             |la AS (
             |  SELECT doc_id,
             |    CAST(ROW_NUMBER() OVER (ORDER BY tf_sum DESC, doc_id) AS BIGINT) AS rank_a
             |  FROM (SELECT * FROM tf ORDER BY tf_sum DESC, doc_id LIMIT 50)),
             |lb AS (
             |  SELECT doc_id,
             |    CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank_b
             |  FROM (SELECT doc_id, n_chars FROM documents
             |        ORDER BY n_chars DESC, doc_id LIMIT 50))
             |SELECT coalesce(la.doc_id, lb.doc_id) AS doc_id, rank_a, rank_b,
             |  coalesce(1000000 // (60 + rank_a), 0)
             |    + coalesce(1000000 // (60 + rank_b), 0) AS rrf_ppm
             |FROM la FULL OUTER JOIN lb ON la.doc_id = lb.doc_id
             |ORDER BY rrf_ppm DESC, doc_id LIMIT 20""".stripMargin)),

    // Token burstiness (Church & Gale 1995): variance-to-mean ratio of
    // each top-100 token's per-document count, zeros included — the
    // lexical statistic that separates CONTENT words (bursty: absent
    // from most docs, repeated where they appear, VMR ≫ 1) from
    // FUNCTION words (Poisson-like, VMR ≈ 1), which is what an
    // IDF-style weighting or stopword inference should key on rather
    // than raw frequency. Fully exact: with s1=Σc, s2=Σc² over the
    // docs containing the token and N the corpus size, VMR =
    // (N·s2 − s1²)/((N−1)·s1) — both sides are BIGINTs in the output
    // and the nano-quantized ratio is one identical division. Scale
    // shape: one groupBy(tok, doc) then a map-side-combinable per-token
    // moment aggregate; the top-100 cut is TakeOrdered, never a global
    // sort; s1² caps the exact path at ~3·10⁹ total occurrences per
    // token — beyond that route s1² through DECIMAL(38,0).
    QueryDef(
      "token_burstiness_topk",
      (s, d) => {
        val docs = t(s, d, "documents")
        val nTot = docs.agg(count(lit(1)).as("n_docs"))
        val perDoc = docs
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
        perDoc.groupBy("tok")
          .agg(count(lit(1)).as("df"), sum("c").as("s1"),
            sum(col("c") * col("c")).as("s2"))
          .crossJoin(broadcast(nTot))
          .select(col("tok"), col("df"), col("s1").as("n_occurrences"),
            (col("n_docs") * col("s2") - col("s1") * col("s1")).as("vmr_num"),
            ((col("n_docs") - 1) * col("s1")).as("vmr_den"),
            round((col("n_docs") * col("s2") - col("s1") * col("s1")).cast("double") /
              ((col("n_docs") - 1) * col("s1")).cast("double") * lit(1e9))
              .cast("long").as("vmr_nano"))
          .orderBy(col("n_occurrences").desc, col("tok"))
          .limit(100)
      },
      Some("""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
             |pd AS (
             |  SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY 1, 2),
             |m AS (
             |  SELECT tok, CAST(count(*) AS BIGINT) AS df,
             |    CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
             |  FROM pd GROUP BY tok)
             |SELECT tok, df, s1 AS n_occurrences,
             |  (n_docs * s2 - s1 * s1) AS vmr_num,
             |  ((n_docs - 1) * s1) AS vmr_den,
             |  CAST(round(CAST(n_docs * s2 - s1 * s1 AS DOUBLE)
             |    / CAST((n_docs - 1) * s1 AS DOUBLE) * 1e9) AS BIGINT) AS vmr_nano
             |FROM m CROSS JOIN n
             |ORDER BY n_occurrences DESC, tok LIMIT 100""".stripMargin)),

    // One exact-arithmetic NMF multiplicative update (Lee & Seung 2000)
    // over the doc-term count matrix — the topic-modeling step
    // expressed as joins and aggregates: with integer-seeded factors
    // W (doc×4, md5-hash in [1,5]) and H (4×vocab, same), the update
    // H ∘ (WᵀV) ⊘ (WᵀWH) has EXACT BIGINT numerator and denominator —
    // WᵀV = Σ_doc w·c is one (topic, tok) aggregate over the corpus
    // join, WᵀW is a 16-cell broadcast, and WᵀWH re-expands it against
    // H — so the updated factor is one identical division per cell,
    // nano-quantized. This is the distributed matrix-multiply shape
    // (never materialize a dense matrix; factor cells are rows): the
    // only corpus-scale stage is the (doc, tok)→(topic, tok) product
    // aggregate, map-side combinable; everything else is
    // O(k·vocab + k²). BIGINT headroom: h·num ≤ 5·(5·len·docs) — route
    // through DECIMAL(38,0) past ~10¹⁷ total token occurrences.
    QueryDef(
      "nmf_multiplicative_step",
      (s, d) => {
        val topics = expr("sequence(0, 3)")
        val v = t(s, d, "documents")
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        val wHash = PipelineQueries.hashPermille(
          concat(col("doc_id").cast("string"), lit("#"), col("k").cast("string")), "nmfw")
        val w = t(s, d, "documents").select(col("doc_id"))
          .select(col("doc_id"), explode(topics).as("k"))
          .select(col("doc_id"), col("k"), (wHash % 5 + 1).as("w"))
        val hHash = PipelineQueries.hashPermille(
          concat(col("tok"), lit("#"), col("k").cast("string")), "nmfh")
        val h = v.select(col("tok")).distinct()
          .select(col("tok"), explode(topics).as("k"))
          .select(col("tok"), col("k"), (hHash % 5 + 1).as("h"))
        val wtv = v.join(w, "doc_id")
          .groupBy("k", "tok").agg(sum(col("w") * col("c")).as("num"))
        val wtw = w.select(col("doc_id"), col("k").as("i"), col("w").as("wi"))
          .join(w.select(col("doc_id"), col("k").as("j"), col("w").as("wj")), "doc_id")
          .groupBy("i", "j").agg(sum(col("wi") * col("wj")).as("g"))
        val wtwh = broadcast(wtw)
          .join(h.select(col("tok"), col("k").as("j"), col("h").as("hj")), "j")
          .groupBy(col("i").as("k"), col("tok")).agg(sum(col("g") * col("hj")).as("den"))
        h.join(wtv, Seq("k", "tok")).join(wtwh, Seq("k", "tok"))
          .select(col("k"), col("tok"), col("h").as("h_old"), col("num"), col("den"),
            round(col("h") * col("num").cast("double") / col("den").cast("double")
              * lit(1e9)).cast("long").as("h_new_nano"))
          .orderBy("k", "tok")
      },
      Some {
        val wH = PipelineQueries.hashSqlExpr(
          "CAST(doc_id AS VARCHAR) || '#' || CAST(k AS VARCHAR)", "nmfw")
        val hH = PipelineQueries.hashSqlExpr(
          "tok || '#' || CAST(k AS VARCHAR)", "nmfh")
        s"""WITH v AS (
           |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents)
           |  GROUP BY 1, 2),
           |w AS (
           |  SELECT doc_id, k, CAST(($wH) % 5 + 1 AS BIGINT) AS w
           |  FROM documents CROSS JOIN (SELECT unnest(range(0, 4)) AS k)),
           |h AS (
           |  SELECT tok, k, CAST(($hH) % 5 + 1 AS BIGINT) AS h
           |  FROM (SELECT DISTINCT tok FROM v) CROSS JOIN (SELECT unnest(range(0, 4)) AS k)),
           |wtv AS (
           |  SELECT k, tok, CAST(sum(w * c) AS BIGINT) AS num
           |  FROM v JOIN w USING (doc_id) GROUP BY 1, 2),
           |wtw AS (
           |  SELECT a.k AS i, b.k AS j, CAST(sum(a.w * b.w) AS BIGINT) AS g
           |  FROM w a JOIN w b USING (doc_id) GROUP BY 1, 2),
           |wtwh AS (
           |  SELECT wtw.i AS k, h.tok, CAST(sum(g * h.h) AS BIGINT) AS den
           |  FROM wtw JOIN h ON wtw.j = h.k GROUP BY 1, 2)
           |SELECT h.k, h.tok, h.h AS h_old, num, den,
           |  CAST(round(h.h * CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e9)
           |       AS BIGINT) AS h_new_nano
           |FROM h JOIN wtv ON h.k = wtv.k AND h.tok = wtv.tok
           |       JOIN wtwh ON h.k = wtwh.k AND h.tok = wtwh.tok
           |ORDER BY h.k, h.tok""".stripMargin
      }),

    // Heaps'-law fit V(N) = K·N^β — vocabulary growth against corpus
    // size, the companion law to zipf_slope_fit (Zipf describes the
    // frequency SHAPE, Heaps the vocabulary GROWTH a tokenizer/vocab
    // budget must plan for; β near 1 here is itself the diagnostic that
    // this synthetic corpus keeps minting new tokens, where natural
    // text bends toward β ≈ 0.5). Five cumulative doc-prefix
    // checkpoints (N/5 … N, exact integer cuts) each measure exact
    // token and distinct-token counts in ONE five-way-exploded
    // aggregate; the log-log OLS runs over the five points PIVOTED
    // INTO A SINGLE ROW, so every double sum is a fixed-order scalar
    // chain — no 5-row shuffle-order FP hazard — and β/K are one
    // expression each. Scale: the 5× token explode is the only corpus
    // stage, map-side combinable to 5 rows.
    QueryDef(
      "heaps_law_fit",
      (s, d) => {
        val nDocs = t(s, d, "documents").agg(count(lit(1)).as("nd"))
        val pts = t(s, d, "documents")
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
          .crossJoin(broadcast(nDocs))
          .select(col("doc_id"), col("tok"),
            explode(expr("sequence(1, 5)")).as("k"), col("nd"))
          .filter(col("doc_id") < expr("nd * k div 5"))
          .groupBy("k")
          .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok")).as("v"))
        val wide = pts.agg(
          max(when(col("k") === 1, col("n_tok"))).as("n1"),
          (2 to 5).map(k => max(when(col("k") === k, col("n_tok"))).as(s"n$k")) ++
            (1 to 5).map(k => max(when(col("k") === k, col("v"))).as(s"v$k")): _*)
        val xs = (1 to 5).map(k => log(col(s"n$k").cast("double")))
        val ys = (1 to 5).map(k => log(col(s"v$k").cast("double")))
        val sx = xs.reduceLeft(_ + _); val sy = ys.reduceLeft(_ + _)
        val sxx = xs.map(x => x * x).reduceLeft(_ + _)
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.reduceLeft(_ + _)
        val beta = (lit(5.0) * sxy - sx * sy) / (lit(5.0) * sxx - sx * sx)
        wide.select(
          col("n1"), col("v1"), col("n5"), col("v5"),
          round(beta * lit(1e9)).cast("long").as("heaps_beta_nano"),
          round(exp((sy - beta * sx) / lit(5.0)) * lit(1e6)).cast("long")
            .as("heaps_k_micro"))
      },
      Some("""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
             |pts AS (
             |  SELECT k, CAST(count(*) AS BIGINT) AS n_tok,
             |    CAST(count(DISTINCT tok) AS BIGINT) AS v
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |        FROM documents) t
             |  CROSS JOIN (SELECT unnest(range(1, 6)) AS k) g
             |  CROSS JOIN nd
             |  WHERE doc_id < (nd * k) // 5
             |  GROUP BY k),
             |wide AS (
             |  SELECT
             |    max(CASE WHEN k = 1 THEN n_tok END) AS n1,
             |    max(CASE WHEN k = 1 THEN v END) AS v1,
             |    max(CASE WHEN k = 2 THEN n_tok END) AS n2,
             |    max(CASE WHEN k = 2 THEN v END) AS v2,
             |    max(CASE WHEN k = 3 THEN n_tok END) AS n3,
             |    max(CASE WHEN k = 3 THEN v END) AS v3,
             |    max(CASE WHEN k = 4 THEN n_tok END) AS n4,
             |    max(CASE WHEN k = 4 THEN v END) AS v4,
             |    max(CASE WHEN k = 5 THEN n_tok END) AS n5,
             |    max(CASE WHEN k = 5 THEN v END) AS v5
             |  FROM pts),
             |f AS (
             |  SELECT *,
             |    ln(CAST(n1 AS DOUBLE)) + ln(CAST(n2 AS DOUBLE)) + ln(CAST(n3 AS DOUBLE))
             |      + ln(CAST(n4 AS DOUBLE)) + ln(CAST(n5 AS DOUBLE)) AS sx,
             |    ln(CAST(v1 AS DOUBLE)) + ln(CAST(v2 AS DOUBLE)) + ln(CAST(v3 AS DOUBLE))
             |      + ln(CAST(v4 AS DOUBLE)) + ln(CAST(v5 AS DOUBLE)) AS sy,
             |    ln(CAST(n1 AS DOUBLE)) * ln(CAST(n1 AS DOUBLE))
             |      + ln(CAST(n2 AS DOUBLE)) * ln(CAST(n2 AS DOUBLE))
             |      + ln(CAST(n3 AS DOUBLE)) * ln(CAST(n3 AS DOUBLE))
             |      + ln(CAST(n4 AS DOUBLE)) * ln(CAST(n4 AS DOUBLE))
             |      + ln(CAST(n5 AS DOUBLE)) * ln(CAST(n5 AS DOUBLE)) AS sxx,
             |    ln(CAST(n1 AS DOUBLE)) * ln(CAST(v1 AS DOUBLE))
             |      + ln(CAST(n2 AS DOUBLE)) * ln(CAST(v2 AS DOUBLE))
             |      + ln(CAST(n3 AS DOUBLE)) * ln(CAST(v3 AS DOUBLE))
             |      + ln(CAST(n4 AS DOUBLE)) * ln(CAST(v4 AS DOUBLE))
             |      + ln(CAST(n5 AS DOUBLE)) * ln(CAST(v5 AS DOUBLE)) AS sxy
             |  FROM wide),
             |b AS (
             |  SELECT *, (5.0 * sxy - sx * sy) / (5.0 * sxx - sx * sx) AS beta
             |  FROM f)
             |SELECT n1, v1, n5, v5,
             |  CAST(round(beta * 1e9) AS BIGINT) AS heaps_beta_nano,
             |  CAST(round(exp((sy - beta * sx) / 5.0) * 1e6) AS BIGINT) AS heaps_k_micro
             |FROM b""".stripMargin)))
}
