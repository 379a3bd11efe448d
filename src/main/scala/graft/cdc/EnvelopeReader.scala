package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Sources for CDC envelope NDJSON lakes (SURVEY.md §2.1 S1/S2/S4).
  *
  * The reference's lake is gzipped NDJSON under Hive-style
  * `topics/<topic>/year=/month=/day=/` partitions written by the Confluent
  * S3 sink (/root/reference/connectors/s3-sink.json:15,20-21) and consumed by
  * DuckDB's `read_ndjson_objects` glob
  * (/root/reference/duckdb/analytics/transform_scd2.py:38). Spark reads
  * `.json.gz` natively and discovers the partition columns from the dir
  * layout; filters on year/month/day prune partitions for free.
  */
object EnvelopeReader {

  /** Explicit-schema NDJSON scan — the `read_ndjson_objects` + json_extract
    * path (transform_scd2.py:38) collapsed into a single schema'd parse.
    * PERMISSIVE mode: malformed lines become all-null rows, which the
    * downstream `op IS NOT NULL` filter drops (transform_scd2.py:39),
    * matching the reference's tolerance for junk lines.
    */
  def readEnvelopes(spark: SparkSession, path: String, rowSchema: StructType): DataFrame =
    spark.read
      .schema(CdcSchemas.envelope(rowSchema))
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Schema-inference scan — the `read_json_auto` path
    * (/root/reference/duckdb/analytics/init_duckdb.sh:23-25). Costs an extra
    * inference pass; prefer [[readEnvelopes]] at scale.
    */
  def readEnvelopesAuto(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Raw-line scan: one string column `json` per line — byte-for-byte what
    * `read_ndjson_objects` yields before extraction. Useful for quarantine /
    * replay flows where the original line must survive.
    */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "json")

  /** Envelope scan that captures undecodable lines instead of silently
    * nulling them: PERMISSIVE parse with `_corrupt_record` retained. Returns
    * (clean envelopes, quarantine rows) — the operational pattern for a
    * 100 TB lake where a junk line must neither kill the job (FAILFAST)
    * nor vanish (plain PERMISSIVE).
    *
    * Both sides are filters over a raw text scan + `from_json` parse (the
    * same Jackson parser the JSON reader uses), so the split is consistent
    * without caching — a `.cache()` of a 100 TB scan would thrash executor
    * storage for no benefit. (The JSON *reader*'s corrupt-record column
    * can't express this lazily: Spark rejects any query over it whose
    * referenced columns prune down to only `_corrupt_record`, which is
    * exactly what both `quarantine` and `clean.count()` do.) Callers that
    * consume BOTH sides should use [[splitEnvelopeLake]], which
    * materializes the two sides in one pass instead of two scans.
    */
  def readEnvelopesWithQuarantine(spark: SparkSession, path: String,
                                  rowSchema: StructType): (DataFrame, DataFrame) = {
    val schema = CdcSchemas.envelope(rowSchema)
      .add(StructField("_corrupt_record", org.apache.spark.sql.types.StringType))
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")
    val parsed = spark.read.text(path)
      .select(from_json(col("value"), schema, opts).as("env"), col("value"))
    // A blank/whitespace-only line (or a literal JSON `null`) parses to a
    // NULL struct whose _corrupt_record is also null — it must land in
    // quarantine, not pass the clean filter as an all-null envelope row
    // (trailing newlines and replay-written quarantine files produce
    // exactly these).
    val bad = col("env").isNull || col("env._corrupt_record").isNotNull
    val clean = parsed.filter(!bad)
      .select("env.*").drop("_corrupt_record")
    val quarantine = parsed.filter(bad)
      .select(col("value").as("json"))
    (clean, quarantine)
  }

  /** Single-pass clean/quarantine materialization: the corrupt flag becomes
    * a partition column, so ONE scan of the source produces both sides as
    * parquet subdirectories (`quarantined=false` / `quarantined=true`) in
    * one write job — the 100 TB shape (no cache, no second scan, split
    * consistent by construction). Returns (clean DF, quarantine DF) read
    * back from the materialized lake; partition pruning makes each side a
    * scan of only its own files.
    */
  def splitEnvelopeLake(spark: SparkSession, path: String, rowSchema: StructType,
                        outBase: String): (DataFrame, DataFrame) = {
    val schema = CdcSchemas.envelope(rowSchema)
      .add(StructField("_corrupt_record", org.apache.spark.sql.types.StringType))
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .withColumn("quarantined", col("_corrupt_record").isNotNull)
      .write.partitionBy("quarantined").mode("overwrite").parquet(outBase)
    // partition values come back as strings (Spark only type-infers
    // numeric/date partition values) — cast once
    val lake = spark.read.parquet(outBase)
      .withColumn("quarantined", col("quarantined").cast("boolean"))
    val clean = lake.filter(!col("quarantined")).drop("quarantined", "_corrupt_record")
    val quarantine = lake.filter(col("quarantined"))
      .select(col("_corrupt_record").as("json"))
    (clean, quarantine)
  }

  /** S3A configuration mirroring the reference's MinIO setup
    * (transform_scd2.py:10-16): path-style access against a custom endpoint.
    */
  def configureS3a(spark: SparkSession, endpoint: String, accessKey: String,
                   secretKey: String, sslEnabled: Boolean = false): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.endpoint", endpoint)
    hc.set("fs.s3a.path.style.access", "true")
    hc.set("fs.s3a.access.key", accessKey)
    hc.set("fs.s3a.secret.key", secretKey)
    hc.set("fs.s3a.connection.ssl.enabled", sslEnabled.toString)
  }

  /** Write an envelope lake the way the reference's S3 sink lays it out:
    * Hive `year=/month=/day=` partitions, gzipped JSON
    * (s3-sink.json:15,20-24). `tsCol` is an epoch-millis column used to
    * derive the partition values (the sink partitions on record time).
    */
  def writeLake(df: DataFrame, path: String, tsCol: String = "payload.ts_ms"): Unit = {
    val ts = timestamp_millis(col(tsCol))
    df.withColumn("year", date_format(ts, "yyyy"))
      .withColumn("month", date_format(ts, "MM"))
      .withColumn("day", date_format(ts, "dd"))
      .write
      .partitionBy("year", "month", "day")
      .option("compression", "gzip")
      .mode("append")
      .json(path)
  }
}
