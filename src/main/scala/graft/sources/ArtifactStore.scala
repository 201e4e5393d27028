package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Shared offline-artifact store protocol — the build/probe split every
  * index-shaped operator uses (IVF quantizers, the BPE tokenizer, the
  * winnowing fingerprint index). The reference's analog is its
  * insert-buffer → background-merge discipline (core/engine.h:210 of
  * /root/reference): expensive index construction happens OFFLINE, once,
  * and the query path only ever reads the published artifact.
  *
  * Contract:
  *  - an artifact is a directory, immutable once published;
  *  - build writes into a staging dir, then an ATOMIC_MOVE publishes it —
  *    a half-written staging dir is never visible under the final path
  *    (crash-safe), and the loser of a cross-process race discards its
  *    staging copy (idempotent);
  *  - the root is keyed on (kind, version, corpus dir): bump the version
  *    whenever the build computation changes so probes never read a store
  *    built by older code.
  *
  * At 100 TB the store lives on the lake next to the corpus and is
  * refreshed by an ingest-time job; here it keys off the corpus dir in
  * java.io.tmpdir so driver-run gates stay self-contained — the first
  * call builds, every later call is probe-only.
  */
object ArtifactStore {

  def root(kind: String, version: String, dir: String): String = {
    // trailing-slash-insensitive: '/x/sf0.01' and '/x/sf0.01/' must key
    // the SAME store (the oracle replay path is derived independently)
    val tag = dir.stripSuffix("/").replaceAll("[^A-Za-z0-9._-]", "_")
    s"${sys.props("java.io.tmpdir")}/graft-store/$kind-$version-$tag"
  }

  private val buildLock = new Object

  /** Build into a staging dir, then atomically move into place. Loser of
    * a cross-process race discards its staging copy. Returns true iff
    * THIS call performed the build (false = already published; the
    * build-once/probe-twice specs key off this). */
  def ensureBuilt(root: String)(build: String => Unit): Boolean =
    buildLock.synchronized {
      val rootPath = Paths.get(root)
      if (Files.exists(rootPath)) false
      else {
        Files.createDirectories(rootPath.getParent)
        val staging = Paths.get(
          root + ".building-" + ProcessHandle.current().pid())
        build(staging.toString)
        try {
          Files.move(staging, rootPath, StandardCopyOption.ATOMIC_MOVE)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            // another process published first — ours is redundant
            org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
            false
        }
      }
    }
}
