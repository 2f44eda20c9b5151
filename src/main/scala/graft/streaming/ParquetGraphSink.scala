package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Production-shaped graph sink: the durable sibling of the in-memory
  * [[SpoGraphSink]] stand-in, persisting each micro-batch of decoded
  * SPO triples to a parquet table — the Spark placement of the
  * reference's Postgres store (`/root/reference/src/Database.cpp`
  * `insert_object`/`insert_relationship`), with the row-at-a-time
  * prepared-statement upserts re-expressed as set-oriented writes.
  *
  * Idempotence (foreachBatch is at-least-once) is structural, not
  * state-held, so it SURVIVES DRIVER RESTARTS — the in-memory sink's
  * `lastAppliedBatchId` field does not:
  *
  *  - each batch writes to its own `batch_id=<id>` directory in
  *    OVERWRITE mode, so a replayed batch replaces its own previous
  *    (possibly partial) write instead of double-appending;
  *  - a persisted marker file (`_applied/<id>`) is created only after
  *    the data commit; replays of fully-applied batches become pure
  *    no-ops, and a crash between data write and marker write just
  *    re-overwrites the same directory.
  *
  * One-directory-per-batch accumulates a small-files problem
  * unboundedly, so [[compact]] periodically folds applied batches into
  * a generational base table:
  *
  *  - the union of the previous base generation and all newly applied
  *    batches is written to `base/gen=<n+1>` (overwrite mode — a
  *    crashed earlier attempt at the same generation is replaced);
  *  - a commit record (`_compaction/commit`, written via temp file +
  *    ATOMIC_MOVE) flips readers to the new generation and records
  *    `through` = the highest batch id folded in; only then are folded
  *    batch directories, their markers, and stale generations deleted.
  *
  * Crash anywhere in that sequence is safe: before the commit flip,
  * readers still see old base + batch dirs and a re-run overwrites the
  * same next generation; after the flip, leftovers are invisible to
  * readers (ids <= `through` are excluded everywhere) and the next
  * compact()/cleanup reaps them. A replay of a batch whose id is
  * already folded (its marker now gone) is refused by `through`, not
  * by the marker. Call it from the foreachBatch driver thread or while
  * the stream is idle — same single-writer discipline as the stream
  * itself.
  *
  * A real lakehouse deployment would swap this for a Delta/Iceberg
  * `MERGE` keyed by `txnAppId`/`txnVersion` — same contract, ACID
  * visibility for concurrent readers on top. Readers here materialize
  * the graph through the SAME batch TripleStore logic the in-memory
  * sink uses, so streamed and batch graphs agree by construction.
  */
final class ParquetGraphSink(tablePath: String) extends Serializable {

  private def triplesDir = s"$tablePath/triples"
  private def appliedDir = Paths.get(tablePath, "_applied")
  private def batchDir(id: Long) = s"$triplesDir/batch_id=$id"
  private def genDir(gen: Long) = s"$tablePath/base/gen=$gen"
  private def commitFile: Path = Paths.get(tablePath, "_compaction", "commit")

  /** (generation, highest folded batch id); (0, -1) before any compaction. */
  private def commitState: (Long, Long) =
    if (!Files.exists(commitFile)) (0L, -1L)
    else {
      val parts = new String(Files.readAllBytes(commitFile), "UTF-8").trim.split(" ")
      (parts(0).stripPrefix("gen=").toLong, parts(1).stripPrefix("through=").toLong)
    }

  /** foreachBatch body. Safe under replays and restarts (see class doc). */
  def merge(batch: DataFrame, batchId: Long): Unit = {
    Files.createDirectories(appliedDir)
    val marker = appliedDir.resolve(batchId.toString)
    // a batch already folded into the base has no marker anymore — the
    // commit record refuses its replay instead
    if (batchId > commitState._2 && !Files.exists(marker)) {
      batch.select("subject", "predicate", "object", "ts_us")
        .write.mode("overwrite").parquet(batchDir(batchId))
      Files.createFile(marker)
    }
  }

  /** Batch ids durably applied and not yet folded into the base. */
  def appliedBatchIds: Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val through = commitState._2
    if (!Files.isDirectory(appliedDir)) Seq.empty
    else {
      val s = Files.list(appliedDir)
      try s.iterator().asScala.map(_.getFileName.toString.toLong)
        .filter(_ > through).toSeq.sorted
      finally s.close()
    }
  }

  /** Fold every applied batch into the next base generation and reap
    * the folded batch directories + markers. Idempotent; crash-safe at
    * every step (see class doc). No-op when nothing new is applied
    * (still reaps leftovers of a previously interrupted cleanup). */
  def compact(spark: SparkSession): Unit = {
    val (gen, through) = commitState
    cleanup(gen, through)
    val applied = appliedBatchIds
    if (applied.isEmpty) return
    val newGen = gen + 1
    val newThrough = applied.max
    val srcs = (if (gen > 0) Seq(genDir(gen)) else Nil) ++ applied.map(batchDir)
    spark.read.parquet(srcs: _*)
      .select("subject", "predicate", "object", "ts_us")
      .write.mode("overwrite").parquet(genDir(newGen))
    Files.createDirectories(commitFile.getParent)
    val tmp = commitFile.getParent.resolve("commit.tmp")
    Files.write(tmp, s"gen=$newGen through=$newThrough".getBytes("UTF-8"))
    Files.move(tmp, commitFile,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    cleanup(newGen, newThrough)
  }

  /** Delete base generations other than `keepGen` and batch data +
    * markers folded through `through` — everything invisible to
    * readers of the current commit. */
  private def cleanup(keepGen: Long, through: Long): Unit = {
    import scala.jdk.CollectionConverters._
    def reap(dir: Path, keep: String => Boolean): Unit =
      if (Files.isDirectory(dir)) {
        val s = Files.list(dir)
        val stale = try s.iterator().asScala.filterNot(p => keep(p.getFileName.toString)).toList
        finally s.close()
        stale.foreach(p =>
          try org.apache.commons.io.FileUtils.forceDelete(p.toFile)
          catch { case _: Throwable => () })
      }
    reap(Paths.get(tablePath, "base"), _ == s"gen=$keepGen")
    reap(Paths.get(triplesDir),
      name => name.stripPrefix("batch_id=").toLong > through)
    reap(appliedDir, _.toLong > through)
  }

  /** Materialize (objects, relationships) from everything durably
    * applied — the current base generation plus unfolded batch
    * directories, same TripleStore logic as the batch surface. */
  def graph(spark: SparkSession): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val (gen, _) = commitState
    val paths = (if (gen > 0) Seq(genDir(gen)) else Nil) ++
      appliedBatchIds.map(batchDir)
    require(paths.nonEmpty, s"no applied batches under $tablePath")
    // only marker-committed batch directories and the committed base
    // generation are listed: a crashed write may have left uncommitted
    // partial directories behind
    val t = spark.read.parquet(paths: _*)
      .select(col("subject"), col("predicate"), col("object"), col("ts_us"))
    val objs = graft.graph.TripleStore.objects(t)
    (objs, graft.graph.TripleStore.relationships(t, objs))
  }
}
