package graft.operators

/** The ONE generational-commit primitive behind the persisted indexes
  * (BandIndex posting shards, VectorIndex inverted lists): a `_commit`
  * file holding `gen=N`, flipped via temp-file + ATOMIC_MOVE so readers
  * see either the old or the new generation, never a partial state
  * (review finding r13: the parse/flip/reap machinery existed as
  * near-verbatim copies that had already begun to diverge — BandIndex
  * reaps eagerly, VectorIndex defers; the POLICY stays with the caller,
  * the mechanism lives here). ParquetGraphSink keeps its own two-field
  * `gen=N through=M` record — different state, same move discipline.
  *
  * LOCAL-FS CONTRACT: commit read/flip and the reap sweep go through
  * `java.nio.file`/`java.io.File`, so index directories must live on a
  * local filesystem. An HDFS/S3 deployment replaces these with the
  * Hadoop `FileSystem` API (open/create+rename for the flip — object
  * stores without atomic rename need a conditional put) — one
  * mechanism to port, since every persisted index shares this object.
  */
object Generations {

  private def commitPath(dir: String) =
    java.nio.file.Paths.get(dir, "_commit")

  /** Committed generation; 0 before any compaction. */
  def currentGen(dir: String): Long = {
    val p = commitPath(dir)
    if (!java.nio.file.Files.exists(p)) 0L
    else new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .trim.stripPrefix("gen=").toLong
  }

  /** Atomically commit `next` as the current generation. */
  def flip(dir: String, next: Long): Unit = {
    val tmp = java.nio.file.Paths.get(dir, "_commit.tmp")
    java.nio.file.Files.write(tmp, s"gen=$next".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, commitPath(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Delete every `gen=*` directory under `dir` other than `keep` —
    * the cleanup sweep a compactor runs BEFORE folding, so a crash
    * anywhere (including between a flip and a reap) strands a stale
    * generation only until the next compaction instead of forever. */
  def reapOthers(dir: String, keep: Long): Unit = {
    val d = new java.io.File(dir)
    val stale = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gen=") &&
        f.getName != s"gen=$keep")
    stale.foreach { f =>
      try org.apache.commons.io.FileUtils.deleteDirectory(f)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
