package graft

import org.apache.spark.sql.DataFrame

/** Shared harness pattern for queries that need local scratch storage
  * (d6's memoryless drain, e8's round-trip files): run the body against
  * a fresh temp dir, EAGERLY materialize the (small) result via
  * localCheckpoint so nothing still references the files, then delete
  * the dir — repeated harness runs must not accumulate temp data.
  * One copy of the cleanup contract, so a fix (e.g. around checkpoint
  * eagerness or delete failures) reaches every caller. */
object Scratch {
  def materialize(prefix: String)(body: String => DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    try body(dir).localCheckpoint(true)
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
