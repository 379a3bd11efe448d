package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction for ingest lakes (SURVEY.md §7.4: the reference's
  * S3 sink flushes every 3 records — `connectors/s3-sink.json:24` — so the
  * lake accumulates thousands of tiny objects; listing + per-file open cost
  * dominates scans long before data volume does).
  *
  * Operational pattern, not an optimizer rule: read the lake, re-bin to
  * target-sized output files, atomically swap directories. Run it behind
  * the ingest on a schedule; readers keep using the same path.
  */
object Compaction {

  /** Rewrite `inputPath` (json/parquet) into ~`targetFileBytes` files at
    * `outputPath`. Returns (files before, files after). Uses the source
    * byte size to pick the output file count — no driver-side data.
    */
  def compact(spark: SparkSession, inputPath: String, outputPath: String,
              format: String = "json", targetFileBytes: Long = 128L << 20,
              compression: String = "gzip"): (Long, Long) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inputPath), spark.sparkContext.hadoopConfiguration)
    val in = new org.apache.hadoop.fs.Path(inputPath)
    val summary = fs.getContentSummary(in)
    val nFilesBefore = summary.getFileCount
    val nOut = math.max(1, (summary.getLength + targetFileBytes - 1) / targetFileBytes).toInt

    // NDJSON is re-binned VERBATIM as text lines: pure re-binning needs no
    // parse, so fidelity is byte-level by construction — schema inference
    // (an extra scan) could re-type or re-order fields, making fidelity
    // depend on inference behavior (ADVICE r4). The output is still NDJSON
    // (a .txt-suffixed line file with json lines is the same lake format;
    // readers glob the directory). recursiveFileLookup skips Hive
    // partition-column discovery — a compacted lake is flat, same as
    // before; partition-preserving compaction runs this per partition dir.
    // Parquet is re-encoded through its self-described schema — no
    // inference involved.
    val df: DataFrame = format match {
      case "json" => spark.read.option("recursiveFileLookup", "true").text(inputPath)
      case "parquet" => spark.read.parquet(inputPath)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
    df.repartition(nOut)
      .write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .format(if (format == "json") "text" else format)
      .save(outputPath)

    val nFilesAfter = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(outputPath)).getFileCount
    (nFilesBefore, nFilesAfter)
  }
}
