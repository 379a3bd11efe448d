package graft.multimodal

import graft.SparkSuite
import graft.multimodal.Multimodal._

import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def media = spark.createDataset(Seq(
    MediaRecord(1L, "image", "fake-png-bytes-aaaa".getBytes("UTF-8")),
    MediaRecord(2L, "audio", "fake-wav-bytes-bb".getBytes("UTF-8")),
    MediaRecord(3L, "video", Array.fill[Byte](64)(7))))

  test("decodeFeatures is deterministic and partition-count independent") {
    val a = decodeFeatures(media).collect().sortBy(_.media_id)
    val b = decodeFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(f => f.width >= 1 && f.width <= 1920 && f.height >= 1 && f.height <= 1080))
    assert(a.find(_.kind == "image").get.duration_ms == 0L)
    assert(a.map(_.fingerprint).distinct.length == 3)
  }

  test("decoder init happens once per partition, not per row") {
    val acc = spark.sparkContext.longAccumulator("decoderInits")
    val factory = new MultimodalSpec.CountingFactory(acc)
    decodeFeatures(media.repartition(2), factory.mk).collect()
    // accumulator counts constructor calls across executors
    assert(acc.value <= 2, s"decoder constructed ${acc.value} times for 2 partitions")
  }

  test("sampleFrames emits stride-aligned offsets") {
    val frames = sampleFrames(media, stride = 16)
      .filter($"media_id" === 3L).collect()
    assert(frames.map(_.getInt(2)).toSeq == Seq(0, 16, 32, 48))
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
  }

  test("binaryStats matches byte-level expectations") {
    val out = binaryStats(media.toDF().withColumnRenamed("bytes", "media"), "media")
      .filter($"media_id" === 1L).head()
    assert(out.getAs[Int]("n_bytes") == 19)
    assert(out.getAs[String]("header_hex") == "66616b652d706e67") // "fake-png"
  }

}

object MultimodalSpec {
  /** Top-level so the closure doesn't capture the (non-serializable) suite. */
  class CountingFactory(acc: org.apache.spark.util.LongAccumulator) extends Serializable {
    def mk: () => MediaDecoder = () => { acc.add(1); new StubDecoder }
  }
}
