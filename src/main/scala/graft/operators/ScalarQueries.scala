package graft.operators

import graft.QueryDef
import graft.QueryDef.t

import org.apache.spark.sql.functions._

/** Scalar-function breadth (beyond the reference's authored surface, which
  * uses no string or date functions at all — SURVEY.md §2.2 "No math
  * beyond /"): string, date/time, and null-handling built-ins with exact
  * oracles, as serving-layer parity evidence.
  */
object ScalarQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "scalar_string_funcs",
      (s, d) => t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        lower(col("c_mktsegment")).as("seg_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).cast("long").as("name_len"),
        concat_ws("/", col("c_mktsegment"), col("c_name")).as("seg_name"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
        replace(col("c_name"), lit("Customer"), lit("Cust")).as("name_replaced"),
        reverse(col("c_mktsegment")).as("seg_rev")),
      Some("""SELECT c_custkey,
             |  upper(c_name) AS name_upper,
             |  lower(c_mktsegment) AS seg_lower,
             |  substr(c_name, 1, 8) AS name_prefix,
             |  CAST(length(c_name) AS BIGINT) AS name_len,
             |  concat_ws('/', c_mktsegment, c_name) AS seg_name,
             |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
             |  coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS name_digits,
             |  replace(c_name, 'Customer', 'Cust') AS name_replaced,
             |  reverse(c_mktsegment) AS seg_rev
             |FROM customer""".stripMargin)),

    QueryDef(
      "scalar_datetime_funcs",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
        (col("o_orderdate").cast("timestamp_ntz") + expr("INTERVAL 30 DAYS")).as("due_date")),
      Some("""SELECT o_orderkey,
             |  CAST(date_part('year', o_orderdate) AS BIGINT) AS y,
             |  CAST(date_part('month', o_orderdate) AS BIGINT) AS m,
             |  CAST(date_part('day', o_orderdate) AS BIGINT) AS d,
             |  CAST(date_part('quarter', o_orderdate) AS BIGINT) AS q,
             |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             |  o_orderdate + INTERVAL 30 DAY AS due_date
             |FROM orders""".stripMargin)),

    // Unpivot/melt (Dataset.unpivot ↔ portable UNION ALL oracle): the
    // per-language counts of text_lang_pivot turned back into rows.
    QueryDef(
      "unpivot_lang_counts",
      (s, d) => {
        val langs = Seq("en", "es", "de", "fr", "zh")
        val wide = t(s, d, "documents").groupBy("source")
          .agg(count(when(col("lang") === langs.head, 1)).as(s"n_${langs.head}"),
            langs.tail.map(l => count(when(col("lang") === l, 1)).as(s"n_$l")): _*)
        wide.unpivot(
          ids = Array(col("source")),
          values = langs.map(l => col(s"n_$l")).toArray,
          variableColumnName = "lang_col",
          valueColumnName = "n_docs")
          .withColumn("lang", expr("substr(lang_col, 3)"))
          .select("source", "lang", "n_docs")
      },
      Some {
        val arms = Seq("en", "es", "de", "fr", "zh").map { l =>
          s"SELECT source, '$l' AS lang, count(*) FILTER (lang = '$l') AS n_docs FROM documents GROUP BY source"
        }
        arms.mkString("", "\nUNION ALL\n", "")
      }),

    // JSON → typed map (P9 extended): parse the props JSON object into a
    // map and inspect keys/values.
    QueryDef(
      "json_map_extract",
      (s, d) => t(s, d, "events").select(
        col("event_id"),
        // Joined to a scalar string: the driver's pandas comparator cannot
        // sort raw array columns (round-1 comparator crash).
        array_join(array_sort(map_keys(from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))), ",")
          .as("prop_keys"),
        get_json_object(col("props"), "$.k").cast("long").as("k_value")),
      Some("""SELECT event_id,
             |  array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
             |FROM events""".stripMargin)),

    // Array-function breadth over tokenized text: sort, dedupe, slice,
    // membership, flatten-free sizing.
    QueryDef(
      "array_funcs",
      (s, d) => {
        val toks = split(col("text"), " ")
        t(s, d, "documents").select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_distinct"),
          array_join(slice(array_sort(array_distinct(toks)), 1, 5), ",").as("first5_sorted"),
          array_contains(toks, "the").as("has_the"),
          element_at(toks, 1).as("first_token"),
          element_at(toks, -1).as("last_token"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
             |  array_to_string((list_sort(list_distinct(string_split(text, ' '))))[1:5], ',') AS first5_sorted,
             |  list_contains(string_split(text, ' '), 'the') AS has_the,
             |  (string_split(text, ' '))[1] AS first_token,
             |  (string_split(text, ' '))[-1] AS last_token
             |FROM documents""".stripMargin)),

    // Positional generator (posexplode): token with its 0-based position.
    // DuckDB 1.0 has no WITH ORDINALITY — the oracle unnests range(len)
    // and indexes the list (memory-cheap, same rows).
    QueryDef(
      "posexplode_tokens",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok")),
      Some("""SELECT doc_id, i AS pos, (string_split(text, ' '))[i + 1] AS tok
             |FROM (SELECT doc_id, text,
             |        unnest(range(len(string_split(text, ' ')))) AS i
             |      FROM documents)""".stripMargin)),

    QueryDef(
      "scalar_null_funcs",
      (s, d) => {
        val seg = when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
          .otherwise(col("c_mktsegment"))
        t(s, d, "customer").select(
          col("c_custkey"),
          coalesce(seg, lit("UNKNOWN")).as("seg_filled"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nullified"),
          when(seg.isNull, 1L).otherwise(0L).as("is_building"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
          least(col("c_acctbal"), lit(1000.0)).as("bal_cap"))
      },
      Some("""SELECT c_custkey,
             |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS seg_filled,
             |  nullif(c_mktsegment, 'BUILDING') AS seg_nullified,
             |  CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL THEN 1 ELSE 0 END AS is_building,
             |  greatest(c_acctbal, 0.0) AS bal_floor,
             |  least(c_acctbal, 1000.0) AS bal_cap
             |FROM customer""".stripMargin)),

    // Regex family beyond the single extract in scalar_string_funcs:
    // global replace, match counting, boolean match — the text-cleaning
    // primitives every corpus filter uses. Patterns stay in the
    // char-class/alternation subset where Java regex (Spark, codegen'd)
    // and RE2 (DuckDB) agree; the divergent constructs (backrefs,
    // lookaround) are deliberately out of contract.
    QueryDef(
      "scalar_regex_funcs",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        regexp_replace(col("text"), "(table|row)", "<rel>").as("masked"),
        expr("regexp_count(text, '(scan|filter)')").cast("long").as("n_scanfilter"),
        col("text").rlike("window .* sort").as("has_window_sort"),
        regexp_extract(col("text"), "\\b(v[a-z]+)\\b", 1).as("first_v_word")),
      Some("""SELECT doc_id,
             |  regexp_replace(text, '(table|row)', '<rel>', 'g') AS masked,
             |  CAST(len(regexp_extract_all(text, '(scan|filter)')) AS BIGINT) AS n_scanfilter,
             |  regexp_matches(text, 'window .* sort') AS has_window_sort,
             |  regexp_extract(text, '\b(v[a-z]+)\b', 1) AS first_v_word
             |FROM documents""".stripMargin)),

    // MapType construction + lookup (the one complex type not yet under
    // the gate next to arrays/structs): per-user event-type counts built
    // INTO a map with map_from_entries, then read back out with fixed-key
    // element_at lookups — deterministic regardless of entry order. The
    // oracle replays the semantics as conditional aggregation (what the
    // map lookup denotes relationally).
    QueryDef(
      "map_event_counts",
      (s, d) => t(s, d, "events")
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
        .select(col("user_id"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
          coalesce(element_at(col("m"), "view"), lit(0L)).as("views"),
          coalesce(element_at(col("m"), "purchase"), lit(0L)).as("purchases"),
          size(col("m")).cast("long").as("n_types")),
      Some("""SELECT user_id,
             |  count(*) FILTER (event_type = 'click') AS clicks,
             |  count(*) FILTER (event_type = 'view') AS views,
             |  count(*) FILTER (event_type = 'purchase') AS purchases,
             |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
             |FROM events GROUP BY user_id""".stripMargin)),

    // Spark 4 VARIANT round trip: a nested document (object + array +
    // numeric leaf from the props JSON) parsed into the binary VARIANT
    // type, then shredded back out with typed variant_get paths — the
    // semi-structured ingestion shape that replaces string-JSON
    // re-parsing per access. The oracle recomputes every extracted leaf
    // from the RELATIONAL base columns (t/u/seq1 never pass through
    // JSON on the DuckDB side), so a lossy encode, a wrong path, or a
    // 1-based array index slip hash-fails; schema_of_variant's inferred
    // type string is pinned literally. At scale VARIANT parses once at
    // ingest and every downstream access is a binary field hop, not a
    // regex/JSON re-parse.
    QueryDef(
      "variant_shred_extract",
      (s, d) => t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("user_id"), col("props"))
        .withColumn("doc", to_json(struct(
          col("event_type").as("t"),
          col("user_id").as("u"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          array(col("event_id"), col("user_id")).as("seq"))))
        .withColumn("v", parse_json(col("doc")))
        .select(col("event_id"),
          expr("variant_get(v, '$.t', 'string')").as("t"),
          expr("variant_get(v, '$.u', 'bigint')").as("u"),
          expr("variant_get(v, '$.k', 'int')").as("k"),
          expr("variant_get(v, '$.seq[1]', 'bigint')").as("seq1"),
          schema_of_variant(col("v")).as("vschema")),
      Some("""SELECT event_id, event_type AS t, user_id AS u,
             |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
             |  user_id AS seq1,
             |  'OBJECT<k: BIGINT, seq: ARRAY<BIGINT>, t: STRING, u: BIGINT>' AS vschema
             |FROM events""".stripMargin)))
}
