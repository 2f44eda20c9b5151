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
  */
object BandIndex {

  /** Session-staged index over `dir`'s BASE split (doc_id % 7 != 0 —
    * the same split `dedup_incremental` models as yesterday's corpus),
    * built in a temp dir at most once per (session, dataset) so the
    * oracle-gated `dedup_indexed` query and the bench both probe a
    * prebuilt index instead of rebuilding per run. Teardown deletes
    * the directory. */
  private val stagedIdx = new graft.operators.SessionStaged[String](
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_bandidx").toString
      try
        // reuse the session-staged feature pass instead of re-running
        // the CPU-dominant 128-perm kernel over 6/7 of the corpus — the
        // gate and bench stage exactly these columns moments earlier
        writeFeats(Dedup.stagedDocFeatures(s, dir).feats
          .filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("ss"), col("bands")),
          tmp, 64, org.apache.spark.sql.SaveMode.Overwrite)
      catch {
        case t: Throwable => deleteDir(tmp); throw t
      }
      tmp
    },
    deleteDir)

  // staged index dirs must not outlive the JVM: nothing else evicts the
  // cache on a normal gate/bench/test exit, and each run would orphan a
  // full parquet index under /tmp
  Runtime.getRuntime.addShutdownHook(new Thread(() => stagedIdx.clear()))

  private def deleteDir(idx: String): Unit =
    try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
    catch { case scala.util.control.NonFatal(_) => () }

  private[graft] def stagedBaseIndex(s: SparkSession, dir: String): String =
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
      .parquet(s"$indexDir/bands")
    feats.select(col("doc_id"), col("ss"))
      .write.mode(mode).parquet(s"$indexDir/features")
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
    * frame (the `shingleFeatures(withSig = true)` shape). */
  private[graft] def probeFeats(s: SparkSession, indexDir: String,
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
    val pruned = s.read.parquet(s"$indexDir/bands")
      .filter(col("shard").isin(needed.toIndexedSeq.map(Int.box): _*))
    // skew cap over the pruned postings ≡ over the full list: a band's
    // postings live in exactly one shard, and every shard a delta band
    // maps to is in the scan. countDistinct, not count: a replayed
    // append doubles a doc's postings, and a duplicate-inflated count
    // crossing the cap would silently drop a real band — breaking
    // append's "duplicates cost bytes, not correctness" contract
    val hot = pruned.groupBy(col("band_key"))
      .agg(countDistinct(col("doc_id")).as("c")).filter(col("c") > hotBandCap)
      .select(col("band_key"))
    val cands = dbands
      .join(broadcast(hot), Seq("band_key"), "left_anti")
      .join(pruned.select(col("doc_id").as("base_id"), col("band_key")),
        "band_key")
      .select(col("base_id").as("doc_a"), col("delta_id").as("doc_b"))
      .distinct()
    // candidate-driven verification: verifyJaccard array-sorts and
    // persists every row of `sets` — for a small probe that would be
    // the whole base corpus's shingle sets. Semi-joining features to
    // the candidate ids first is a no-op semantically (verifyJaccard
    // only ever joins sets to candidate ids) and bounds the sort to
    // candidate cardinality.
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .unionByName(cands.select(col("doc_b").as("doc_id"))).distinct()
    // dropDuplicates: a replayed append may have written a doc's
    // feature row twice; duplicate set rows would duplicate its pairs
    val sets = s.read.parquet(s"$indexDir/features")
      .unionByName(dfeats.select(col("doc_id"), col("ss")))
      .join(candIds, Seq("doc_id"), "leftsemi")
      .dropDuplicates("doc_id")
    Dedup.verifyJaccard(cands, sets, "ss", tau)
      .select(col("doc_b").as("delta_id"), col("doc_a").as("base_id"),
        col("jaccard"))
      .orderBy(col("delta_id"), col("base_id"))
  }
}
