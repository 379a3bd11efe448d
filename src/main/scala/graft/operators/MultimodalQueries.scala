package graft.operators

import graft.QueryDef
import graft.QueryDef.t
import graft.multimodal.Multimodal

import org.apache.spark.sql.functions._

/** Multimodal-column queries. The testdata has no real media, so the
  * `documents` text bytes stand in as the opaque binary payload — the
  * binary-column plumbing (encode → binary ops → decode) is exactly what a
  * real image/audio table exercises.
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Cheap metadata pass over binary columns (no decode): byte length,
    // header fingerprint, content hash — all codegen'd built-ins.
    QueryDef(
      "multimodal_binary_stats",
      (s, d) => Multimodal.binaryStats(
          t(s, d, "documents").select(col("doc_id"), encode(col("text"), "UTF-8").as("media")),
          "media")
        .select("doc_id", "n_bytes", "header_hex", "content_md5"),
      Some("""SELECT doc_id,
             |  octet_length(encode(text)) AS n_bytes,
             |  lower(substr(hex(encode(text)), 1, 16)) AS header_hex,
             |  md5(text) AS content_md5
             |FROM documents""".stripMargin)),

    // Transcode-campaign planner: per modality (deterministically
    // assigned from doc_id — the fake-media convention of this family),
    // roll up current storage and the post-transcode target at the
    // modality's compression profile (image 30%, audio 20%, video 10%
    // of source — integer div so the plan is exact), with per-modality
    // savings fractions. This is the budgeting query a 100 TB media
    // lake runs BEFORE committing a re-encode fleet: the real decode
    // is stubbed like the rest of the family, the Spark-side shape —
    // one scan, one ≤3-row map-side-combined aggregate — is the real
    // contract.
    QueryDef(
      "multimodal_bitrate_plan",
      (s, d) => {
        val q = when(col("modality") === "image", 3L)
          .when(col("modality") === "audio", 2L).otherwise(1L)
        t(s, d, "documents")
          .select(col("doc_id"),
            length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
          .withColumn("modality",
            element_at(array(lit("image"), lit("audio"), lit("video")),
              (col("doc_id") % 3 + 1).cast("int")))
          .withColumn("q", q)
          .withColumn("target_bytes", expr("(n_bytes * q) div 10"))
          .groupBy("modality")
          .agg(count(lit(1)).as("n_assets"),
            sum("n_bytes").as("current_bytes"),
            sum("target_bytes").as("target_bytes"))
          .select(col("modality"), col("n_assets"), col("current_bytes"),
            col("target_bytes"),
            ((col("current_bytes") - col("target_bytes")).cast("double") /
              col("current_bytes").cast("double")).as("savings_frac"))
          .orderBy("modality")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |      ELSE 'video' END AS modality,
             |    CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 2 ELSE 1 END AS q
             |  FROM documents)
             |SELECT modality, CAST(count(*) AS BIGINT) AS n_assets,
             |  CAST(sum(n_bytes) AS BIGINT) AS current_bytes,
             |  CAST(sum((n_bytes * q) // 10) AS BIGINT) AS target_bytes,
             |  CAST(sum(n_bytes) - sum((n_bytes * q) // 10) AS DOUBLE)
             |    / CAST(sum(n_bytes) AS DOUBLE) AS savings_frac
             |FROM b GROUP BY modality ORDER BY modality""".stripMargin)),

    // Deterministic frame sampling (explode shape of keyframe selection).
    QueryDef(
      "multimodal_frame_sample",
      (s, d) => Multimodal.sampleFrames(
          t(s, d, "documents")
            .select(col("doc_id").as("media_id"), lit("video").as("kind"),
                    encode(col("text"), "UTF-8").as("bytes"))
            .as[Multimodal.MediaRecord](org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]),
          stride = 16)
        .select(col("media_id").as("doc_id"),
                col("frame_no").cast("long").as("frame_no"),
                col("byte_offset").cast("long").as("byte_offset")),
      Some("""SELECT doc_id, byte_offset // 16 AS frame_no, byte_offset
             |FROM (SELECT doc_id,
             |        unnest(range(0, CAST(octet_length(encode(text)) AS BIGINT), 16)) AS byte_offset
             |      FROM documents)""".stripMargin)),

    // Partition-batched stub decode (mapPartitions). The stub derives its
    // fake dimensions from md5(bytes), so the whole decode path — schema,
    // partition batching, per-partition decoder init, feature arithmetic —
    // is hash-checked against a DuckDB replica of the same arithmetic.
    QueryDef(
      "multimodal_decode_features",
      (s, d) => Multimodal.decodeFeatures(
          t(s, d, "documents")
            .select(col("doc_id").as("media_id"), lit("image").as("kind"),
                    encode(col("text"), "UTF-8").as("bytes"))
            .as[Multimodal.MediaRecord](org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]))
        .toDF(),
      Some("""SELECT doc_id AS media_id, 'image' AS kind,
             |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             |  CAST(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1920 + 1 AS INT) AS width,
             |  CAST((CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) >> 11) % 1080 + 1 AS INT) AS height,
             |  CAST(0 AS BIGINT) AS duration_ms,
             |  md5(text) AS fingerprint
             |FROM documents""".stripMargin)),

    // Resize planning on top of the decoded features: fit into 224x224
    // without upscaling. Both the downscale branch (stub widths run up to
    // 1920) and the no-op branch (dims already inside the box) are
    // exercised; the oracle replays the md5-derived dims and the same
    // IEEE double scale arithmetic.
    QueryDef(
      "multimodal_resize_plan",
      (s, d) => Multimodal.resizePlan(
          Multimodal.decodeFeatures(
            t(s, d, "documents")
              .select(col("doc_id").as("media_id"), lit("image").as("kind"),
                      encode(col("text"), "UTF-8").as("bytes"))
              .as[Multimodal.MediaRecord](org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]))
            .toDF(),
          boxW = 224, boxH = 224)
        .select("media_id", "width", "height", "scale",
          "out_width", "out_height", "est_out_bytes"),
      Some("""WITH f AS (
             |  SELECT doc_id AS media_id,
             |    CAST(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1920 + 1 AS INT) AS width,
             |    CAST((CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) >> 11) % 1080 + 1 AS INT) AS height
             |  FROM documents),
             |p AS (
             |  SELECT *, least(least(CAST(224 AS DOUBLE) / width,
             |                        CAST(224 AS DOUBLE) / height), 1.0) AS scale
             |  FROM f)
             |SELECT media_id, width, height, scale,
             |  greatest(1, CAST(floor(width * scale) AS INT)) AS out_width,
             |  greatest(1, CAST(floor(height * scale) AS INT)) AS out_height,
             |  CAST(greatest(1, CAST(floor(width * scale) AS INT)) AS BIGINT)
             |    * greatest(1, CAST(floor(height * scale) AS INT)) * 3 AS est_out_bytes
             |FROM p""".stripMargin)),

    // Audio-video synchronization plan — the alignment table a training
    // pipeline materializes before cutting multimodal clips: per sampled
    // video frame (every 12th at 24 fps), its presentation timestamp and
    // the 32 ms / 1024-byte audio window covering it (16 kHz s16le, hop
    // 512 samples). Duration comes from the stub container (md5-derived,
    // like decode_features) so the whole plan is hash-checked; every
    // quantity is integer division — pts = frame·1000 div 24, window =
    // pts div 32, offset = window·1024 — engine-identical by
    // construction. Shape: per-row explode of a bounded frame sequence,
    // zero shuffles, pipelines into the scan at any scale.
    QueryDef(
      "multimodal_av_sync_plan",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          (expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            % 30000L + 1000L).as("duration_ms"))
        .withColumn("frame_no", explode(
          sequence(lit(0L), expr("duration_ms * 24 div 1000 - 1"), lit(12L))))
        .select(col("doc_id"), col("duration_ms"), col("frame_no"),
          expr("frame_no * 1000 div 24").as("pts_ms"),
          expr("(frame_no * 1000 div 24) div 32").as("audio_win"),
          expr("((frame_no * 1000 div 24) div 32) * 1024").as("audio_byte_offset")),
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 30000 + 1000
             |      AS duration_ms
             |  FROM documents),
             |fr AS (
             |  SELECT doc_id, duration_ms,
             |    unnest(range(0, duration_ms * 24 // 1000, 12)) AS frame_no
             |  FROM f)
             |SELECT doc_id, duration_ms, frame_no,
             |  frame_no * 1000 // 24 AS pts_ms,
             |  (frame_no * 1000 // 24) // 32 AS audio_win,
             |  ((frame_no * 1000 // 24) // 32) * 1024 AS audio_byte_offset
             |FROM fr""".stripMargin)),

    // Perceptual-hash-style near-dup detection over the media payload —
    // the image-dedup shape (pHash: decode → downsample → per-BLOCK
    // fingerprint → bucket join) on the family's stand-in media: the
    // DECODED content stream (tokens here; pixel blocks for real images —
    // the decode itself is the per-partition stub the whole family
    // shares) is cut into 4 positional blocks, each fingerprinted, and
    // candidate pairs come from an equality join on (block position,
    // fingerprint) — the pigeonhole band join, never all-pairs: two
    // media sharing ≥ 2 of 4 block fingerprints are near-dups (one
    // shared block ≈ coincidence / boilerplate; the ≥ 2 verify runs only
    // on banded candidates). Blocks are cut in CONTENT units, not raw
    // bytes, precisely so a local edit perturbs only its own block —
    // byte-offset quarters would shift every downstream block and miss
    // all near-dups (measured: 0 byte-quarter pairs vs 13 block pairs on
    // the fixture). Same LSH discipline as dedup_simhash_hamming.
    QueryDef(
      "multimodal_phash_dedup",
      (s, d) => {
        val media = t(s, d, "documents")
          .select(col("doc_id"),
            graft.text.TextOps.tokens(col("text")).as("w"))
          .withColumn("n", size(col("w")).cast("long"))
          .filter(col("n") >= 8)
        val quarters = media
          .select(col("doc_id"), explode(expr("sequence(0, 3)")).as("qi"),
            col("w"), col("n"))
          .select(col("doc_id"), col("qi"),
            md5(concat_ws(" ",
              expr("slice(w, CAST(1 + qi * (n div 4) AS INT), CAST(n div 4 AS INT))")))
              .as("fp"))
        val pairs = quarters
          .select(col("doc_id").as("doc_a"), col("qi"), col("fp"))
          .join(quarters.select(col("doc_id").as("doc_b"), col("qi"), col("fp")),
            Seq("qi", "fp"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("n_shared_quarters"))
          .filter(col("n_shared_quarters") >= 2)
          .orderBy("doc_a", "doc_b")
        pairs
      },
      Some("""WITH media AS (
             |  SELECT doc_id, string_split(text, ' ') AS w,
             |    len(string_split(text, ' ')) AS n
             |  FROM documents WHERE len(string_split(text, ' ')) >= 8),
             |quarters AS (
             |  SELECT doc_id, qi,
             |    md5(array_to_string(w[1 + qi * (n // 4) : (qi + 1) * (n // 4)], ' '))
             |      AS fp
             |  FROM media CROSS JOIN (SELECT unnest(range(0, 4)) AS qi) g)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(count(*) AS BIGINT) AS n_shared_quarters
             |FROM quarters a JOIN quarters b
             |  ON a.qi = b.qi AND a.fp = b.fp AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING count(*) >= 2
             |ORDER BY doc_a, doc_b""".stripMargin)))
}
