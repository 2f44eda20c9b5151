package graft.operators

/** Atomic MULTI-INDEX publish for the serving tier (r16) — the missing
  * coordination layer above the per-index [[Generations]] commits.
  *
  * THE PROBLEM: a RAG deployment serves retrieval off SEVERAL persisted
  * artifacts at once — the sparse postings index (TermIndex) and the
  * dense vector index (VectorIndex) at minimum — and each advances
  * independently as its ingest loop appends and compacts. Per-index
  * commits are atomic, but a reader resolving each index's current
  * state INDEPENDENTLY can pair a postings view from after an ingest
  * batch with a vector view from before it: the two legs then disagree
  * about which documents exist, and a fused ranking (q_hybrid_rrf's
  * shape) silently drops or double-counts the difference. At 100 TB
  * with continuously-running ingest this is the steady state, not a
  * corner case.
  *
  * THE MECHANISM — pinned FILE manifests, the Iceberg/Delta snapshot
  * discipline re-expressed over the house index layout: a snapshot
  * version is one manifest file, `_snap.v=N`, whose content lists, per
  * leg, the exact parquet data files (relative to the leg's generation
  * directory) that existed at the publish instant. Pinning FILES —
  * not just the generation number — is what makes a snapshot immutable:
  * appends land NEW files inside the current generation directory, so
  * a generation-number pin would watch new documents trickle into one
  * leg before the other, exactly the torn read the snapshot exists to
  * prevent. Data files are write-once (appends add, compaction writes
  * a NEW generation directory), so a pinned file set never changes
  * underneath its readers; the pinned probes
  * (`TermIndex.probePinned` / `VectorIndex.probeIvfPinned`) read
  * exactly the listed files and score bit-identically to the probe
  * that ran at publish time, for as long as the snapshot lives.
  *
  * ATOMICITY: the VERSION rides in the manifest's NAME (a racing
  * reader lists {old} or {old, new} and takes the max — never a
  * partial state; no renames, nothing an object store lacks), and the
  * content is immutable once published (`overwrite = false`: a
  * duplicate publish of the same version fails loudly instead of
  * racing). Publish runs on the ingest writer thread BETWEEN batches —
  * the same single-writer contract compaction already carries — so the
  * file census never catches a leg mid-append.
  *
  * RETENTION: compaction reaps superseded generations, which would
  * pull pinned files out from under a serving reader. The ingest loop
  * passes [[protectedGens]] — every generation pinned by any LIVE
  * snapshot version of that index — into its compact calls; [[retire]]
  * deletes old snapshot versions, after which the next sweep reaps the
  * freed generations. A reader holding a retired version gets the loud
  * missing-generation failure from its pinned probe, naming the cause
  * — never silently-empty results.
  */
object ServingSnapshot {

  private val MarkerPrefix = "_snap.v="

  /** One leg's pinned view: the index root, the generation its files
    * live in, and the data files (relative to that generation's
    * directory) that existed at publish. */
  final case class Leg(dir: String, gen: Long, files: Seq[String])

  /** One consistent cross-index cut. */
  final case class Snapshot(version: Long, legs: Map[String, Leg])

  /** Latest published version; 0 before any publish. */
  def currentVersion(snapDir: String): Long = {
    val vs = IndexFs.list(snapDir).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix).toLong)
    if (vs.isEmpty) 0L else vs.max
  }

  /** Publish a new snapshot version pinning each named leg's current
    * committed generation AND its exact data-file census, atomically
    * (the version-in-name create). Single-writer between ingest
    * batches; a concurrent duplicate publish of the same version fails
    * loudly on the no-overwrite create. */
  def publish(snapDir: String, legs: Map[String, String]): Long = {
    require(legs.nonEmpty, "ServingSnapshot.publish: no legs")
    require(!legs.keysIterator.exists(n => n.contains("\t") || n.contains("\n")),
      "ServingSnapshot.publish: leg names must not contain tabs/newlines")
    val v = currentVersion(snapDir) + 1
    val content = legs.toSeq.sortBy(_._1).flatMap { case (name, d) =>
      val gen = Generations.currentGen(d)
      val files = IndexFs.listParquetRecursive(s"$d/gen=$gen")
      require(files.nonEmpty,
        s"ServingSnapshot.publish: leg '$name' has no data files under " +
          s"$d/gen=$gen — not a built index")
      files.map(f => s"$name\t$d\t$gen\t$f")
    }.mkString("\n")
    IndexFs.createMarker(s"$snapDir/$MarkerPrefix$v", content,
      overwrite = false)
    v
  }

  /** The latest snapshot. Loud when none has been published. */
  def resolve(snapDir: String): Snapshot = {
    val v = currentVersion(snapDir)
    require(v > 0, s"ServingSnapshot.resolve: no snapshot published under $snapDir")
    resolveAt(snapDir, v)
  }

  /** A specific snapshot version — the handle a long-lived reader holds
    * onto. Loud when the version was retired (or never published),
    * naming the cause. */
  def resolveAt(snapDir: String, version: Long): Snapshot = {
    val file = s"$snapDir/$MarkerPrefix$version"
    require(IndexFs.exists(file),
      s"ServingSnapshot.resolveAt: version $version not found under " +
        s"$snapDir — retired (or never published); re-resolve the " +
        "latest snapshot")
    val legs = IndexFs.readSmall(file).split("\n").iterator
      .filter(_.nonEmpty)
      .map { line =>
        val Array(name, dir, gen, f) = line.split("\t", 4)
        (name, dir, gen.toLong, f)
      }.toSeq.groupBy(_._1).map { case (name, rows) =>
        name -> Leg(rows.head._2, rows.head._3, rows.map(_._4))
      }
    Snapshot(version, legs)
  }

  /** Generations of `indexDir` pinned by any LIVE snapshot version —
    * the `protect` set the ingest loop passes into its compact calls.
    * Live versions are bounded by the retirement policy; manifests are
    * small text files. */
  def protectedGens(snapDir: String, indexDir: String): Set[Long] =
    IndexFs.list(snapDir).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(n => resolveAt(snapDir, n.stripPrefix(MarkerPrefix).toLong))
      .flatMap(_.legs.valuesIterator)
      .collect { case Leg(d, g, _) if d == indexDir => g }
      .toSet

  /** Delete all but the newest `keepLatest` snapshot versions. The
    * freed generations are reaped by the NEXT compaction sweep (whose
    * [[protectedGens]] no longer includes them) — retire never touches
    * index data itself. */
  def retire(snapDir: String, keepLatest: Int = 1): Unit = {
    require(keepLatest >= 1, "ServingSnapshot.retire: keepLatest must be >= 1")
    val vs = IndexFs.list(snapDir)
      .map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix).toLong)
      .sorted
    vs.dropRight(keepLatest)
      .foreach(v => IndexFs.deleteQuietly(s"$snapDir/$MarkerPrefix$v"))
  }
}
