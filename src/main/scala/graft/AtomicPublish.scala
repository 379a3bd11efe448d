package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** First-writer-wins publication of a directory of derived data, shared by
  * every scratch-lake builder (the CDC envelope lake, the cached streaming
  * results, the 10×-scaled bench lake).
  *
  * Contract: `dst` is either absent or a COMPLETE publication at all times,
  * so concurrent readers (the DuckDB oracle, a second verify/bench process)
  * never observe a half-written glob. A publication carries a `stamp`
  * (content fingerprint / generation tag) in its completion marker; a
  * present publication with a different stamp is stale — built from other
  * inputs or by older code — and is atomically replaced rather than
  * silently reused.
  *
  * Publishers (not readers) are serialized on a sibling lock file: an
  * unserialized racer could re-check the marker, lose the race to a
  * concurrent winner, and delete the winner's freshly published dir —
  * briefly exposing readers to a partial glob, the exact condition this
  * helper exists to prevent. Under the lock, the marker re-check plus the
  * atomic move keep `dst` either absent or complete. The JVM-level monitor
  * covers same-process threads (FileLock is per-process and throws on
  * overlap).
  */
object AtomicPublish {

  private val publishMonitor = new Object
  private val MarkerName = "_GRAFT_COMPLETE"

  /** Ensure `dst` holds a complete publication stamped `stamp`; `build`
    * receives a private temp dir and must leave the full content there.
    * The expensive build runs outside the lock (it should not serialize);
    * only the swap is locked. Returns `dst`.
    */
  def ensure(dst: String, stamp: String = "")(build: String => Unit): String = {
    val dstPath = Paths.get(dst)
    if (isCurrent(dstPath, stamp)) return dst

    val tag = s"${ProcessHandle.current().pid()}-${System.nanoTime()}"
    val tmp = Paths.get(s"$dst.tmp-$tag")
    // A failed build must not leak its private dir: repeated failures of a
    // large publication (the 10x bench lake) would otherwise accumulate
    // orphaned trees (ADVICE r4).
    try {
      build(tmp.toString)
      Files.writeString(tmp.resolve(MarkerName), (stamp +: manifestOf(tmp)).mkString("\n"))
    } catch {
      case t: Throwable => deleteTree(tmp); throw t
    }

    publishMonitor.synchronized {
      val ch = java.nio.channels.FileChannel.open(Paths.get(s"$dst.lock"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          // While holding the publishers' lock: reap orphans from crashed
          // publishers — a death after the tmp→dst install but before
          // deleteTree(doomed) leaks a $dst.doomed-<pid>-<nano> tree (and
          // a kill -9 mid-build leaks $dst.tmp-…). Tags carry the owner
          // pid; only trees whose owner is dead are swept, so a live
          // concurrent publisher's private dirs are never touched.
          sweepDeadSiblings(dstPath)
          if (isCurrent(dstPath, stamp)) deleteTree(tmp) // another writer won with the same stamp
          else {
            // Stale publication: move it ASIDE first, then install, then
            // delete the doomed copy. `dst` flips old-complete →
            // new-complete with no absent/shrinking window, and an
            // in-flight reader mid-scan of the old part files keeps a
            // stable directory snapshot until the post-swap delete (open
            // handles survive even that on POSIX) instead of having files
            // removed underneath it (ADVICE r4).
            val doomed = Paths.get(s"$dst.doomed-$tag")
            if (Files.exists(dstPath)) Files.move(dstPath, doomed, StandardCopyOption.ATOMIC_MOVE)
            Files.move(tmp, dstPath, StandardCopyOption.ATOMIC_MOVE)
            deleteTree(doomed)
          }
        } finally lock.release()
      } finally ch.close()
    }
    dst
  }

  /** Delete `$dst.doomed-*` / `$dst.tmp-*` siblings whose owning pid (the
    * tag's first component) is no longer alive. Caller holds the publish
    * lock, so no concurrent sweep or install races this.
    */
  private def sweepDeadSiblings(dstPath: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val parent = dstPath.getParent
    if (parent == null || !Files.isDirectory(parent)) return
    val base = dstPath.getFileName.toString
    val prefixes = Seq(s"$base.doomed-", s"$base.tmp-")
    Files.list(parent).iterator().asScala.toSeq.foreach { p =>
      val n = p.getFileName.toString
      prefixes.find(n.startsWith).foreach { pre =>
        val ownerPid = n.stripPrefix(pre).takeWhile(_.isDigit)
        if (ownerPid.nonEmpty) {
          val h = ProcessHandle.of(ownerPid.toLong)
          if (!(h.isPresent && h.get().isAlive)) deleteTree(p)
        }
      }
    }
  }

  /** Marker format: line 1 = stamp, remaining lines = `size\trelpath` for
    * every published regular file. A matching stamp alone is NOT proof of a
    * live publication: /tmp reapers delete large, old data files while
    * keeping the 0-byte marker and small `.crc` siblings, leaving a
    * "complete" directory whose glob matches nothing (observed round 7:
    * the CDC lake's `part-*.txt` vanished under an intact marker). The
    * manifest makes the marker self-validating — any listed file missing
    * or resized means the publication is gone and must be rebuilt.
    */
  private def manifestOf(dir: Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString != MarkerName)
      .map(p => s"${Files.size(p)}\t${dir.relativize(p)}")
      .toSeq.sorted
  }

  private def isCurrent(dstPath: Path, stamp: String): Boolean = {
    import scala.jdk.CollectionConverters._
    val marker = dstPath.resolve(MarkerName)
    if (!Files.exists(marker)) return false
    val lines = Files.readAllLines(marker).asScala.toSeq
    if (lines.headOption.getOrElse("") != stamp) return false
    val manifest = lines.drop(1)
    if (manifest.nonEmpty) manifest.forall { line =>
      line.split("\t", 2) match {
        case Array(sz, rel) =>
          val f = dstPath.resolve(rel)
          Files.isRegularFile(f) && Files.size(f) == sz.toLong
        case _ => false
      }
    } else {
      // Pre-manifest marker (earlier rounds): trust it only if some
      // non-hidden data file survived alongside it — an empty husk whose
      // large files were reaped must rebuild.
      Files.walk(dstPath).iterator().asScala.exists { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && !n.startsWith(".") && !n.startsWith("_")
      }
    }
  }

  /** Recursively delete `p` if present. */
  def deleteTree(p: Path): Unit = if (Files.exists(p)) {
    Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
  }

  /** Content fingerprint of a directory tree: md5 over the sorted
    * (relative path, size, mtime) of every regular file. Used as (part of)
    * a publication stamp so derived lakes rebuild when their source data
    * changes — e.g. a new round's regenerated testdata — instead of being
    * silently reused.
    */
  def dirFingerprint(dir: String): String = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    val entries = Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => s"${root.relativize(p)}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}")
      .toSeq.sorted
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }
}
