package graft.operators

/** The ONE generational-commit primitive behind the persisted indexes
  * (BandIndex posting shards, VectorIndex inverted lists, TermIndex
  * postings): a per-generation marker file whose NAME carries the
  * committed generation, so readers see either the old or the new
  * generation, never a partial state (review finding r13: the
  * parse/flip/reap machinery existed as near-verbatim copies that had
  * already begun to diverge — BandIndex reaps eagerly, VectorIndex
  * defers; the POLICY stays with the caller, the mechanism lives
  * here). ParquetGraphSink keeps its own two-field `gen`/`through`
  * record — different state, same marker discipline.
  *
  * COMMIT MECHANISM (r16 — the Hadoop `FileSystem` port, VERDICT r15
  * item 1): the committed generation is `max N` over `_commit.gen=N`
  * marker files. A flip CREATES `_commit.gen=next` — file creation is
  * atomically visible on HDFS and local FS (the name appears whole)
  * and on object stores (the PUT lands whole at close), and since the
  * generation rides in the NAME, a reader racing the create parses
  * either {old} or {old, next} and takes the max — both correct. No
  * rename anywhere, so the mechanism needs nothing an object store
  * lacks (the previous `_commit` + ATOMIC_MOVE design was local-only
  * and would have needed a conditional put on S3). Older markers are
  * swept best-effort after the new one lands; a crash between create
  * and sweep strands extra markers that change nothing (max wins) and
  * the next flip re-sweeps. Single-writer, like the sinks.
  */
object Generations {

  private val MarkerPrefix = "_commit.gen="

  /** Committed generation; 0 before any compaction. */
  def currentGen(dir: String): Long = {
    val gens = IndexFs.list(dir).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix).toLong)
    if (gens.isEmpty) 0L else gens.max
  }

  /** Commit `next` as the current generation: create its marker (the
    * atomically-visible step), then sweep older markers best-effort. */
  def flip(dir: String, next: Long): Unit = {
    IndexFs.createMarker(s"$dir/$MarkerPrefix$next", s"gen=$next")
    IndexFs.list(dir)
      .map(_.getPath.getName)
      .filter(n => n.startsWith(MarkerPrefix) &&
        n.stripPrefix(MarkerPrefix).toLong < next)
      .foreach(n => IndexFs.deleteQuietly(s"$dir/$n"))
  }

  /** Delete every `gen=*` directory under `dir` other than `keep` —
    * the cleanup sweep a compactor runs BEFORE folding, so a crash
    * anywhere (including between a flip and a reap) strands a stale
    * generation only until the next compaction instead of forever.
    * `protect` (r16, the [[ServingSnapshot]] retention seam) exempts
    * generations pinned by a live snapshot: a reader serving off a
    * published snapshot keeps its pinned generation on disk across
    * compactions until the snapshot is retired — the next sweep after
    * retirement reaps it. */
  def reapOthers(dir: String, keep: Long, protect: Set[Long] = Set.empty): Unit =
    IndexFs.list(dir)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen=") &&
        st.getPath.getName != s"gen=$keep" &&
        !st.getPath.getName.stripPrefix("gen=").toLongOption.exists(protect))
      .foreach(st => IndexFs.deleteQuietly(st.getPath.toString))
}
