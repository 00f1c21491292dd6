package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE owner of the staged-directory publish protocol shared by
  * every persisted-index maintenance op (`Bm25`/`Positional` range
  * rewrites, `Ann.deleteFromPersistedIvf` partition rewrites): swap
  * each staged directory in with an aside-rename, and on ANY failure
  * roll every already-published item back to its parked original —
  * the layout is never left with a subset of the change applied.
  *
  * Park dirs are dot-prefixed (invisible to parquet partition/range
  * discovery) and retained until the CALLER finishes its metadata
  * swaps; a hard crash mid-protocol leaves them on disk for manual
  * restore (entry fail-fast in each caller refuses to run over
  * leftover parks), and a rebuild is always safe. Callers with NO
  * staged content for an item (`allowMissingStaged` — an emptied IVF
  * partition) publish the absence: parking alone removes the old
  * directory. */
private[operators] object LayoutSwap {

  def publish[A](fs: FileSystem, items: Seq[A], dirP: A => Path,
                 oldP: A => Path, stagedP: A => Path, op: String,
                 allowMissingStaged: Boolean = false): Unit = {
    val published = scala.collection.mutable.ArrayBuffer.empty[A]
    try {
      items.foreach { it =>
        require(fs.rename(dirP(it), oldP(it)),
          s"$op: could not park ${dirP(it)} aside; layout untouched")
        val staged = stagedP(it)
        if (fs.exists(staged)) {
          if (!fs.rename(staged, dirP(it)))
            throw new IllegalStateException(
              s"$op: could not publish $staged -> ${dirP(it)}")
        } else if (!allowMissingStaged)
          throw new IllegalStateException(
            s"$op: staged content missing at $staged")
        published += it
      }
    } catch {
      case e: Throwable =>
        // roll back every item already swapped this run, then the one
        // that failed mid-park (whose dir may sit at oldP only)
        (published ++ items.find(it => !published.contains(it)))
          .foreach { it =>
            if (fs.exists(oldP(it))) {
              fs.delete(dirP(it), true)
              fs.rename(oldP(it), dirP(it))
            }
          }
        throw new IllegalStateException(
          s"$op: publish failed, all items rolled back: ${e.getMessage}", e)
    }
  }

  /** Drop the crash-recovery parks — ONLY after every metadata swap
    * (manifest, stats) the caller owns has committed. */
  def removeParks[A](fs: FileSystem, items: Seq[A], oldP: A => Path): Unit =
    items.foreach(it => fs.delete(oldP(it), true))
}
