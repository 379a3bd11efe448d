package graft.operators

import graft.SparkSuite
import graft.cdc.CdcFixtures._

class CompactionSpec extends SparkSuite {

  test("compaction collapses a flush.size=3 lake into few files, same rows") {
    val src = tempDir("compact_src")
    val lines = (1 to 90).map(i =>
      envelope("null", productRow(Some(i), s"p$i", null, i * 1.0), "c",
        1733333333000L + i, i.toLong))
    writeLake(src, lines, flushSize = 3) // 30 tiny files, like the reference sink
    val dst = tempDir("compact_dst")

    val (before, after) = Compaction.compact(
      spark, src.getAbsolutePath, dst.getAbsolutePath, format = "json")
    assert(before == 30, s"fixture should be 30 small files, got $before")
    assert(after <= 2, s"expected ~1 compacted file, got $after")

    val rows = spark.read.json(dst.getAbsolutePath)
    assert(rows.count() == 90)

    // NDJSON compaction is verbatim re-binning (no parse, no inference):
    // the output must carry the exact input line multiset byte-for-byte.
    val srcLines = spark.read.option("recursiveFileLookup", "true").text(src.getAbsolutePath)
    val dstLines = spark.read.option("recursiveFileLookup", "true").text(dst.getAbsolutePath)
    assert(srcLines.exceptAll(dstLines).isEmpty && dstLines.exceptAll(srcLines).isEmpty,
      "compacted lake must preserve input lines verbatim")
  }
}
