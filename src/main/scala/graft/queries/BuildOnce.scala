package graft.queries

/** The ONE build-once derived-artifact cache recipe, shared by every
  * warmup-able index/model build (persisted IVF, the BM25 indexes, the
  * DSIR model+weights — previously three hand-rolled copies that had
  * already started to drift): fingerprint the SOURCE parquet file
  * (path + mtime + length + build params) so a regenerated fixture at
  * the same path rebuilds instead of silently serving stale data; root
  * the artifact under the JVM tmpdir, like a real deployment's index
  * directory next to its table; serialize check-then-build JVM-wide so
  * concurrent specs or bench warmups cannot race the existence check.
  * Cross-PROCESS builds of the same key are not serialized — the
  * fixture contract is one verify-at-a-time per machine (the Handoff
  * rule), and a real deployment builds indexes from one scheduled job.
  */
object BuildOnce {

  /** Return the cache path for (`name`, fingerprint of `src`),
    * running `build(path)` first iff `done(path)` — the path of the
    * LAST file the build writes (its `_SUCCESS`) — does not exist, so
    * a crashed half-build is re-attempted, never served. `name` must
    * carry every build parameter that changes the artifact (e.g.
    * `ivf-k16`): it is part of both the directory name and the key. */
  def cached(name: String, src: java.io.File)
            (done: String => String)(build: String => Unit): String = {
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${src.getPath}|${src.lastModified}|${src.length}|$name"
        .getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
    val path = s"${sys.props("java.io.tmpdir")}/graft-$name-$fp"
    lock.synchronized {
      if (!new java.io.File(done(path)).exists()) build(path)
    }
    path
  }
  private val lock = new Object
}
