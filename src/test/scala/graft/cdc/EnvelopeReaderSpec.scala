package graft.cdc

import graft.SparkSuite
import graft.cdc.CdcFixtures._

import org.apache.spark.sql.functions._

class EnvelopeReaderSpec extends SparkSuite {

  private val t0 = 1733333333000L
  private def lines = Seq(
    envelope("null", productRow(Some(1), "a", "d1", 1.5), "c", t0, 10),
    envelope(productRow(Some(1), "a", "d1", 1.5), productRow(Some(1), "a", "d2", 2.5), "u", t0 + 1000, 20))

  test("S2: schema-inference path (read_json_auto analogue) sees the same events") {
    val d = tempDir("autolake")
    writeLake(d, lines)
    val auto = EnvelopeReader.readEnvelopesAuto(spark, d.getAbsolutePath)
    // inference finds payload.* nested fields; values must round-trip
    val ids = auto.select(col("payload.after.id")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 1L))
    val ops = auto.select("payload.op").collect().map(_.getString(0)).sorted
    assert(ops.toSeq == Seq("c", "u"))
  }

  test("S4: S3A configuration helper pins the full MinIO conf contract") {
    // The S3A transport itself is permanently unverifiable in this
    // environment: /opt/spark/jars carries no hadoop-aws or AWS SDK, so
    // org.apache.hadoop.fs.s3a.S3AFileSystem does not exist on the
    // classpath and neither a MinIO container nor an in-process S3 stub
    // could be driven. What IS ours is the emitted Hadoop conf — the exact
    // contract transform_scd2.py:10-16 sets on DuckDB's httpfs — so every
    // key is pinned here.
    EnvelopeReader.configureS3a(spark, "http://localhost:9000", "ak", "sk")
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.endpoint") == "http://localhost:9000")
    assert(hc.get("fs.s3a.path.style.access") == "true",
      "MinIO requires path-style addressing (transform_scd2.py:13 url_style=path)")
    assert(hc.get("fs.s3a.access.key") == "ak")
    assert(hc.get("fs.s3a.secret.key") == "sk")
    assert(hc.get("fs.s3a.connection.ssl.enabled") == "false",
      "reference endpoint is plain http (transform_scd2.py:14 use_ssl=false)")
    // ssl flag follows the endpoint scheme when requested
    EnvelopeReader.configureS3a(spark, "https://minio:9000", "ak2", "sk2", sslEnabled = true)
    assert(hc.get("fs.s3a.connection.ssl.enabled") == "true")
    assert(hc.get("fs.s3a.access.key") == "ak2")
  }

  test("raw-line scan preserves lines byte-for-byte") {
    val d = tempDir("rawlake")
    writeLake(d, lines)
    val raw = EnvelopeReader.readRaw(spark, d.getAbsolutePath + "/year=*/month=*/day=*/*.json")
    assert(raw.collect().map(_.getString(0)).toSet == lines.toSet)
  }

  test("quarantine split: junk lines survive for replay, clean lines parse") {
    val d = tempDir("quarlake")
    writeLake(d, lines ++ Seq("{broken json", "also not json }"))
    val (clean, quarantine) = EnvelopeReader.readEnvelopesWithQuarantine(
      spark, d.getAbsolutePath + "/year=*/month=*/day=*/*.json", CdcSchemas.productsRow)
    assert(clean.count() == 2)
    assert(quarantine.collect().map(_.getString(0)).toSet ==
           Set("{broken json", "also not json }"))
    // clean side feeds the normal pipeline
    assert(Scd2.transform(clean, Seq("name", "description", "price")).count() == 2)
  }

  test("blank/whitespace lines and JSON null are quarantined, not all-null clean rows") {
    // from_json returns a NULL struct (with a null _corrupt_record) for
    // empty input — without the env-is-null guard these pass the clean
    // filter as all-null envelope rows (trailing-newline artifacts and
    // replay-written quarantine files produce exactly these)
    val d = tempDir("blanklake")
    writeLake(d, lines ++ Seq("", "   ", "null"))
    val (clean, quarantine) = EnvelopeReader.readEnvelopesWithQuarantine(
      spark, d.getAbsolutePath + "/year=*/month=*/day=*/*.json", CdcSchemas.productsRow)
    assert(clean.count() == 2, "blank lines must not leak into the clean side")
    assert(clean.filter(col("payload").isNull).count() == 0)
    assert(quarantine.collect().map(_.getString(0)).toSet == Set("", "   ", "null"))
  }

  test("single-pass split materializes clean + quarantine sides in one write") {
    val d = tempDir("splitlake")
    val out = tempDir("splitout")
    writeLake(d, lines ++ Seq("{broken json"))
    val (clean, quarantine) = EnvelopeReader.splitEnvelopeLake(
      spark, d.getAbsolutePath + "/year=*/month=*/day=*/*.json",
      CdcSchemas.productsRow, out.getAbsolutePath)
    assert(clean.count() == 2)
    assert(quarantine.collect().map(_.getString(0)).toSeq == Seq("{broken json"))
    // the split landed as partition dirs: each side scans only its own files
    val dirs = out.listFiles().map(_.getName).filter(_.startsWith("quarantined=")).sorted
    assert(dirs.toSeq == Seq("quarantined=false", "quarantined=true"))
    assert(Scd2.transform(clean, Seq("name", "description", "price")).count() == 2)
  }
}
