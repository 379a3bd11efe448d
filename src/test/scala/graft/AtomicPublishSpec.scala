package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** First-writer-wins publication with content stamps: complete-or-absent
  * visibility, reuse on matching stamp, rebuild on mismatch (the ADVICE r3
  * ScaleSmoke defect — a stale scaled lake from older testdata was
  * silently reused because the marker carried no provenance).
  */
class AtomicPublishSpec extends AnyFunSuite {

  private def freshDst(): String =
    Files.createTempDirectory("atomicpub").resolve("pub").toString

  test("builds once, then reuses a publication with the same stamp") {
    val dst = freshDst()
    var builds = 0
    def build(tmp: String): Unit = {
      builds += 1
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "data.txt"), s"build-$builds")
    }
    AtomicPublish.ensure(dst, "v1")(build)
    AtomicPublish.ensure(dst, "v1")(build)
    assert(builds == 1, "same stamp must not rebuild")
    assert(Files.readString(Paths.get(dst, "data.txt")) == "build-1")
  }

  test("a stamp mismatch replaces the publication atomically") {
    val dst = freshDst()
    var builds = 0
    def build(tmp: String): Unit = {
      builds += 1
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "data.txt"), s"build-$builds")
    }
    AtomicPublish.ensure(dst, "fingerprint-A")(build)
    AtomicPublish.ensure(dst, "fingerprint-B")(build) // source data changed
    assert(builds == 2, "changed stamp must force a rebuild")
    assert(Files.readString(Paths.get(dst, "data.txt")) == "build-2")
    // stale sibling temp dirs are gone; only the publication + lock remain
    val siblings = Files.list(Paths.get(dst).getParent).toArray.map(_.toString)
    assert(!siblings.exists(_.contains(".tmp-")), s"leaked temp build dirs: ${siblings.toSeq}")
  }

  test("legacy markers (empty stamp) are honored by the default stamp") {
    val dst = freshDst()
    Files.createDirectories(Paths.get(dst))
    Files.writeString(Paths.get(dst, "_GRAFT_COMPLETE"), "")
    Files.writeString(Paths.get(dst, "data.txt"), "legacy")
    var builds = 0
    AtomicPublish.ensure(dst) { _ => builds += 1 }
    assert(builds == 0, "a prior round's empty-stamp publication must be reused")
    assert(Files.readString(Paths.get(dst, "data.txt")) == "legacy")
  }

  test("a reaped data file under an intact marker forces a rebuild") {
    // /tmp cleaners delete large, old files but keep the 0-byte marker
    // (observed round 7: the CDC lake's part files vanished, the marker
    // survived, and every glob reader crashed on an "empty" complete dir).
    val dst = freshDst()
    var builds = 0
    def build(tmp: String): Unit = {
      builds += 1
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "part-00000.txt"), s"build-$builds")
    }
    AtomicPublish.ensure(dst, "v1")(build)
    Files.delete(Paths.get(dst, "part-00000.txt")) // the reaper strikes
    AtomicPublish.ensure(dst, "v1")(build)
    assert(builds == 2, "missing manifest file must invalidate the publication")
    assert(Files.readString(Paths.get(dst, "part-00000.txt")) == "build-2")
  }

  test("a legacy manifest-less marker over an empty husk forces a rebuild") {
    val dst = freshDst()
    Files.createDirectories(Paths.get(dst))
    Files.writeString(Paths.get(dst, "_GRAFT_COMPLETE"), "")
    Files.writeString(Paths.get(dst, "._reaped.crc"), "checksum") // only hidden debris left
    var builds = 0
    AtomicPublish.ensure(dst) { tmp =>
      builds += 1
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "data.txt"), "rebuilt")
    }
    assert(builds == 1, "a husk with no visible data files must rebuild")
    assert(Files.readString(Paths.get(dst, "data.txt")) == "rebuilt")
  }

  test("dirFingerprint changes when a file's content size changes") {
    val d = Files.createTempDirectory("fp")
    Files.writeString(d.resolve("a.parquet"), "12345")
    val fp1 = AtomicPublish.dirFingerprint(d.toString)
    assert(fp1 == AtomicPublish.dirFingerprint(d.toString), "deterministic")
    Files.writeString(d.resolve("a.parquet"), "1234567890")
    assert(AtomicPublish.dirFingerprint(d.toString) != fp1, "size change must alter the fingerprint")
  }
}
