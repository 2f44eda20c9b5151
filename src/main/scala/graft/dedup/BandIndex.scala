package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted minhash band index: build over the base corpus once, probe
  * with each delta batch many times.
  *
  * `dedup_incremental` computes BOTH sides' band keys per run — right
  * for a one-shot query, wrong for the production daily-ingest loop
  * where the 100 TB base corpus is indexed once and only the (small)
  * delta is featurized per batch. This index persists two halves under
  * one directory (the VectorIndex build/probe discipline applied to the
  * dedup tier):
  *
  *  - `bands/` — the base posting list (band_key, doc_id), written
  *    `partitionBy("shard")` with shard = pmod(band_key, nShards), so
  *    each band shard IS a parquet partition directory;
  *  - `features/` — (doc_id, ss) base shingle sets for the exact
  *    verification join.
  *
  * The at-scale payoff mirrors the IVF probe: a delta batch's bands
  * cover a bounded set of shards, the probe derives that set
  * driver-side (≤ nShards ints — driver-sized by construction) and the
  * posting scan is PARTITION PRUNING, not a filter — disk read scales
  * with the delta's shard coverage, never the full posting list. The
  * candidate join stays bipartite (delta bands × pruned base postings,
  * never base × base), with the same hot-band skew cap as the inline
  * query; verification is the shared sorted-merge Jaccard kernel.
  *
  * Band→shard assignment is a pure function of the band key, so a
  * band's full posting count lives in exactly one shard and the
  * hot-band cap computed over the pruned scan equals the cap the
  * inline query computes over the full posting list — the spec pins
  * probe ≡ `dedup_incremental` on the same corpus split.
  *
  * GROWTH LIFECYCLE: both halves live under a GENERATION directory
  * (`gen=N/bands`, `gen=N/features`) selected by a `_commit` record —
  * the [[graft.streaming.ParquetGraphSink]] compaction discipline
  * applied to posting shards. [[append]] accumulates one file set per
  * batch inside the current generation (the streaming ingest loop);
  * [[compact]] folds the generation into `gen=N+1` with duplicate
  * postings/features (from at-least-once replayed appends) dropped,
  * flips the commit via temp-file + ATOMIC_MOVE, then reaps the old
  * generation. A crash before the flip leaves readers on the intact
  * old generation and a re-run overwrites the same next generation; a
  * crash after the flip leaves only invisible leftovers. Single-writer
  * (the foreachBatch driver thread), like the stream itself.
  *
  * FILESYSTEM (r16, VERDICT r15 item 1): generation/commit handling
  * and every directory sweep resolve through the Hadoop `FileSystem`
  * API ([[graft.operators.IndexFs]] / [[graft.operators.Generations]])
  * — local paths serve through `file://` unchanged, HDFS/S3 through
  * their registered schemes; HadoopFsIndexSpec drives the
  * build/append/compact/probe lifecycle over a non-`file:` scheme.
  */
object BandIndex {

  /** Committed generation; 0 before any compaction (the shared
    * [[graft.operators.Generations]] mechanism — review finding r13:
    * the parse/flip machinery existed as per-index copies). */
  private[graft] def currentGen(indexDir: String): Long =
    graft.operators.Generations.currentGen(indexDir)

  private[graft] def bandsPath(indexDir: String): String =
    s"$indexDir/gen=${currentGen(indexDir)}/bands"

  private[graft] def featuresPath(indexDir: String): String =
    s"$indexDir/gen=${currentGen(indexDir)}/features"

  /** Fold the current generation into the next: duplicate postings and
    * feature rows (replayed appends) dropped, each shard's postings
    * rewritten as one co-located file set instead of one per append.
    * Readers flip atomically via the commit record; the old generation
    * is reaped only after the flip. */
  def compact(s: SparkSession, indexDir: String,
              protect: Set[Long] = Set.empty): Unit = {
    import org.apache.spark.sql.SaveMode
    val gen = currentGen(indexDir)
    val next = gen + 1
    // Overwrite mode: a crashed earlier attempt at this generation is
    // replaced wholesale before any reader can see it
    s.read.parquet(s"$indexDir/gen=$gen/bands")
      .select(col("doc_id"), col("band_key"), col("shard")).distinct()
      .repartition(col("shard"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard")
      .parquet(s"$indexDir/gen=$next/bands")
    s.read.parquet(s"$indexDir/gen=$gen/features")
      .dropDuplicates("doc_id")
      .repartition(col("doc_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/gen=$next/features")
    graft.operators.Generations.flip(indexDir, next)
    // eager sweep (BandIndex's original discipline — no deferred-reap
    // grace), but over ALL stale generations, not just the one this
    // fold consumed: a generation protected by a then-live snapshot in
    // an earlier compact must be reclaimed by the FIRST sweep after its
    // retirement, or it leaks forever (review finding r16)
    graft.operators.Generations.reapOthers(indexDir, next, protect)
  }

  /** [[probe]] pinned to a [[graft.operators.ServingSnapshot]] leg —
    * the snapshot reader path: the manifest names the exact band and
    * feature files, so the probe is immutable under later appends
    * (new files in the live generation) and compactions (new
    * generation directories). The audit shape: re-run a dedup decision
    * against the EXACT index state that made it. Loud when the pinned
    * generation is gone — retired-then-reaped. */
  def probePinned(s: SparkSession, leg: graft.operators.ServingSnapshot.Leg,
                  delta: DataFrame,
                  tau: Double = Dedup.JaccardTauShingles,
                  hotBandCap: Long = Dedup.IncrementalHotBandCap,
                  nShards: Int = 64): DataFrame = {
    graft.operators.ServingSnapshot.requireLeg(leg,
      Seq("bands/", "features/"), "BandIndex.probePinned")
    val genDir = s"${leg.dir}/gen=${leg.gen}"
    val bandFiles = leg.files.filter(_.startsWith("bands/"))
      .map(f => s"$genDir/$f")
    val featFiles = leg.files.filter(_.startsWith("features/"))
      .map(f => s"$genDir/$f")
    // basePath keeps shard= partition inference (and the probe's
    // partition pruning) over the explicit band file list; features
    // are unpartitioned
    probeRel(
      s.read.option("basePath", s"$genDir/bands").parquet(bandFiles: _*),
      s.read.parquet(featFiles: _*),
      Dedup.shingleFeatures(delta, withSig = true, withSim = false),
      tau, hotBandCap, nShards)
  }

  /** Session-staged index over `dir`'s BASE split (doc_id % 7 != 0 —
    * the same split `dedup_incremental` models as yesterday's corpus),
    * built in a temp dir at most once per (session, dataset) so the
    * oracle-gated `dedup_indexed` query and the bench both probe a
    * prebuilt index instead of rebuilding per run. Teardown deletes
    * the directory. */
  /** The staged index keeps the two parquet RELATIONS beside the
    * directory: a fresh `read.parquet` per probe re-lists the shard
    * directories and re-reads footers every run (~0.2 s/probe at
    * bench scale), while a cached relation's FileIndex lists once per
    * session. Valid ONLY because the staged index is immutable for
    * the session — the streaming sink, which appends, reads fresh
    * relations via the `indexDir` overload so it always sees appended
    * files. */
  final case class StagedIndex(dir: String, bands: DataFrame, features: DataFrame)

  private val stagedIdx = new graft.operators.SessionStaged[StagedIndex](
    (s, dir) => {
      // the index directory rides the cross-invocation StageCache
      // (r17): a later JVM's staging is two relation opens, no build.
      // On a miss the build still reuses the session-staged feature
      // pass instead of re-running the CPU-dominant 128-perm kernel
      // over 6/7 of the corpus
      val (idxDir, _) = graft.operators.StageCache.dir(
          s, dir, "band_index", 1, "graft_bandidx") { into =>
        writeFeats(Dedup.stagedDocFeatures(s, dir).feats
          .filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("ss"), col("bands")),
          into, 64, org.apache.spark.sql.SaveMode.Overwrite)
      }
      StagedIndex(idxDir, s.read.parquet(bandsPath(idxDir)),
        s.read.parquet(featuresPath(idxDir)))
    },
    // cache entries outlive the session by design; only a cache-off
    // scratch temp dir is reaped here
    idx => if (!graft.operators.StageCache.isCachePath(idx.dir))
      deleteDir(idx.dir))

  // staged index dirs must not outlive the JVM: nothing else evicts the
  // cache on a normal gate/bench/test exit, and each run would orphan a
  // full parquet index under /tmp
  Runtime.getRuntime.addShutdownHook(new Thread(() => stagedIdx.clear()))

  private def deleteDir(idx: String): Unit =
    graft.operators.IndexFs.deleteQuietly(idx)

  private[graft] def stagedBaseIndex(s: SparkSession, dir: String): StagedIndex =
    stagedIdx.get(s, dir)

  /** Featurize `docs` with the frozen minhash family and persist the
    * sharded posting list + verification features. Deterministic: same
    * docs + nShards → identical postings and shard assignment. */
  def build(s: SparkSession, docs: DataFrame, indexDir: String,
            nShards: Int = 64): Unit =
    writeIndex(docs, indexDir, nShards, org.apache.spark.sql.SaveMode.Overwrite)

  /** Fold `docs` INTO an existing index — the ingest loop's growth step
    * (see [[graft.streaming.StreamNearDedup]]). An at-least-once replay
    * may append a doc's rows twice; [[probe]] tolerates duplicate
    * postings and features (candidates are distinct'd, verification
    * sets dedup on doc_id), so duplicates cost bytes, not correctness. */
  def append(s: SparkSession, docs: DataFrame, indexDir: String,
             nShards: Int = 64): Unit =
    writeIndex(docs, indexDir, nShards, org.apache.spark.sql.SaveMode.Append)

  private def writeIndex(docs: DataFrame, indexDir: String, nShards: Int,
                         mode: org.apache.spark.sql.SaveMode): Unit = {
    val feats = Dedup.shingleFeatures(docs, withSig = true, withSim = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try writeFeats(feats, indexDir, nShards, mode)
    finally { feats.unpersist(); () }
  }

  /** [[append]] over a pre-built delta feature frame the caller already
    * holds (and has persisted — both writes below consume it). */
  private[graft] def appendFeats(feats: DataFrame, indexDir: String,
                                 nShards: Int): Unit =
    writeFeats(feats, indexDir, nShards, org.apache.spark.sql.SaveMode.Append)

  private def writeFeats(feats: DataFrame, indexDir: String, nShards: Int,
                         mode: org.apache.spark.sql.SaveMode): Unit = {
    // repartition on the partition column before the write: without
    // it every write task holds rows of every shard and emits one
    // file per (task, shard) — measured 71 s at sf0.1 x 1024 shards
    // (~32k tiny files, pure filesystem overhead) vs 3.5-7.5 s with
    // the shuffle, which also co-locates each shard's postings (one
    // file per shard, the layout a 100 TB cluster wants anyway)
    feats.select(col("doc_id"), explode(col("bands")).as("band_key"))
      .withColumn("shard",
        pmod(col("band_key"), lit(nShards.toLong)).cast("int"))
      .repartition(col("shard"))
      .write.mode(mode).partitionBy("shard")
      .parquet(bandsPath(indexDir))
    // repartition(col) is an AQE coalesce target: the write emits
    // advisory-sized files (few at bench scale, ~64 MB targets on a
    // cluster) instead of one tiny file per upstream kernel partition —
    // every probe scans this directory, so its file count is probe
    // overhead
    feats.select(col("doc_id"), col("ss"))
      .repartition(col("doc_id"))
      .write.mode(mode).parquet(featuresPath(indexDir))
  }

  /** Near-dup (delta_id, base_id, jaccard) pairs of `delta` against the
    * indexed base, reading only the posting shards the delta's bands
    * hit. `nShards` must match the build. Delta doc_ids are assumed
    * disjoint from base doc_ids (they are new arrivals). */
  def probe(s: SparkSession, indexDir: String, delta: DataFrame,
            tau: Double = Dedup.JaccardTauShingles,
            hotBandCap: Long = Dedup.IncrementalHotBandCap,
            nShards: Int = 64): DataFrame =
    // no persist here: probe returns a LAZY frame (house query
    // contract), so a scoped persist would be evicted before execution
    // ever runs. The delta kernel is re-run once per consumer — delta
    // is batch-sized by contract; a host that consumes the probe
    // eagerly (the streaming sink) featurizes once itself, persists,
    // and calls [[probeFeats]]/[[appendFeats]] directly.
    probeFeats(s, indexDir,
      Dedup.shingleFeatures(delta, withSig = true, withSim = false),
      tau, hotBandCap, nShards)

  /** [[probe]] over a pre-built (doc_id, ss, bands) delta feature
    * frame (the `shingleFeatures(withSig = true)` shape). Callers that
    * probe repeatedly persist `dfeats` (the staged QueryDef, the
    * streaming sink) — it is referenced three times below.
    *
    * Shaped as a SERVING path: the pruned posting scan runs ONCE (the
    * per-band bucket aggregate carries the hot cap as a size filter —
    * the bucketPairs discipline), and the verify streams each side's
    * feature source through a single hash join against the candidate
    * pairs. The delta and its candidate set are batch-probe-sized by
    * contract, so they ride broadcast exchanges; the base corpus is
    * only ever scanned, never shuffled. A probe is a handful of jobs
    * regardless of corpus size — the r9 shape re-derived the delta and
    * re-scanned the postings per consumer (35 jobs, 4x the inline
    * query's wall at bench scale).
    */
  private[graft] def probeFeats(s: SparkSession, indexDir: String,
                                dfeats: DataFrame, tau: Double,
                                hotBandCap: Long, nShards: Int): DataFrame =
    probeRel(s.read.parquet(bandsPath(indexDir)),
      s.read.parquet(featuresPath(indexDir)), dfeats, tau, hotBandCap, nShards)

  /** [[probeFeats]] over pre-read index relations — the staged
    * QueryDef path, where the relations' file listing and footers are
    * read once per session instead of once per probe. */
  private[graft] def probeRel(bands: DataFrame, features: DataFrame,
                              dfeats: DataFrame, tau: Double,
                              hotBandCap: Long, nShards: Int): DataFrame = {
    val dbands = dfeats
      .select(col("doc_id").as("delta_id"), explode(col("bands")).as("band_key"))
    // driver-side shard selection: the distinct shard list is bounded
    // by nShards regardless of corpus or delta size
    val needed = dbands
      .select(pmod(col("band_key"), lit(nShards.toLong)).cast("int").as("shard"))
      .distinct().collect().map(_.getInt(0)).sorted
    // shard is a PARTITION column of bands/ — isin() prunes at planning
    val pruned = bands
      .filter(col("shard").isin(needed.toIndexedSeq.map(Int.box): _*))
    // The row-level prune IS the candidate join: stream the pruned
    // postings once through a broadcast-hash join against the delta's
    // (batch-sized by contract) band rows, then exclude the probing
    // batch's OWN doc_ids from the base side. The exclusion is a
    // no-op on first delivery (delta ids are new arrivals, disjoint
    // from the index); after a crash-after-append replay it removes
    // exactly the batch's own appended postings — hot-band counts and
    // candidates are REPLAY-INVARIANT (a band within |batch| of the
    // cap cannot flip over it only on replay). No shuffle so far: the
    // scan, both broadcast joins, and the projection are one pipeline.
    val matched = pruned
      .join(broadcast(dbands), "band_key")
      .join(broadcast(dfeats.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    // ONE shuffle for cap + pair expansion: per matched band, distinct
    // base ids and distinct delta ids in the same aggregate, the hot
    // cap as a size filter, pairs as a double explode. A matched
    // band's postings are all in the scan (a band lives in exactly one
    // shard), so size(collect_set) ≡ the full posting list's
    // countDistinct cap; collect_set, not collect_list, because a
    // replayed append doubles a doc's postings and a
    // duplicate-inflated size crossing the cap would silently drop a
    // real band. Same materialized-bucket skew discipline as
    // bucketPairs. Multi-band pairs stay duplicated here — the
    // verify's pair-level dropDuplicates folds them.
    val cands = matched
      .groupBy(col("band_key"))
      .agg(collect_set(col("doc_id")).as("ids"),
        collect_set(col("delta_id")).as("delta_ids"))
      .filter(size(col("ids")) <= hotBandCap)
      .select(explode(col("ids")).as("doc_a"), col("delta_ids"))
      .select(col("doc_a"), explode(col("delta_ids")).as("doc_b"))
    // Candidate-bounded verify, one scan per side: features/ streams
    // through a hash join against the broadcast candidate pairs (never
    // sorted or shuffled corpus-wide), the delta side joins its own
    // feature frame. The size-ratio prefilter (Jaccard >= tau implies
    // min(|A|,|B|) >= tau * max(|A|,|B|)) rides the joined columns.
    val baseSide = features
      .join(broadcast(cands), col("doc_id") === col("doc_a"))
      // one pair-level dedup catches both duplicate sources: a pair
      // candidate repeated across shared bands, and a replayed append
      // that wrote a doc's feature row twice
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"),
        array_sort(col("ss")).as("set_a"), size(col("ss")).as("n_a"))
    val deltaSets = dfeats.select(col("doc_id").as("doc_b"),
      array_sort(col("ss")).as("set_b"), size(col("ss")).as("n_b"))
    baseSide.join(broadcast(deltaSets), "doc_b")
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        greatest(col("n_a"), col("n_b")).cast("double") * tau)
      .withColumn("jaccard", org.apache.spark.sql.GraftSqlBridge.column(
        graft.expressions.JaccardSorted(
          org.apache.spark.sql.GraftSqlBridge.expression(col("set_a")),
          org.apache.spark.sql.GraftSqlBridge.expression(col("set_b")))))
      .filter(col("jaccard") >= tau)
      .select(col("doc_b").as("delta_id"), col("doc_a").as("base_id"),
        col("jaccard"))
      .orderBy(col("delta_id"), col("base_id"))
  }
}
