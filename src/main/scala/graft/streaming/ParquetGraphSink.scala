package graft.streaming

import java.nio.file.{Files, Paths}
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
  * A real lakehouse deployment would swap this for a Delta/Iceberg
  * `MERGE` keyed by `txnAppId`/`txnVersion` — same contract, ACID
  * visibility for concurrent readers on top. Readers here materialize
  * the graph through the SAME batch TripleStore logic the in-memory
  * sink uses, so streamed and batch graphs agree by construction.
  */
final class ParquetGraphSink(tablePath: String) extends Serializable {

  private def triplesDir = s"$tablePath/triples"
  private def appliedDir = Paths.get(tablePath, "_applied")

  /** foreachBatch body. Safe under replays and restarts (see class doc). */
  def merge(batch: DataFrame, batchId: Long): Unit = {
    Files.createDirectories(appliedDir)
    val marker = appliedDir.resolve(batchId.toString)
    if (!Files.exists(marker)) {
      batch.select("subject", "predicate", "object", "ts_us")
        .write.mode("overwrite").parquet(s"$triplesDir/batch_id=$batchId")
      Files.createFile(marker)
    }
  }

  /** Batch ids durably applied so far. */
  def appliedBatchIds: Seq[Long] = {
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(appliedDir)) Seq.empty
    else {
      val s = Files.list(appliedDir)
      try s.iterator().asScala.map(_.getFileName.toString.toLong).toSeq.sorted
      finally s.close()
    }
  }

  /** Materialize (objects, relationships) from everything durably
    * applied — same TripleStore logic as the batch surface. */
  def graph(spark: SparkSession): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val applied = appliedBatchIds
    require(applied.nonEmpty, s"no applied batches under $tablePath")
    // read only marker-committed batch directories: a crashed write may
    // have left an uncommitted partial directory behind
    val paths = applied.map(id => s"$triplesDir/batch_id=$id")
    val t = spark.read.option("basePath", triplesDir).parquet(paths: _*)
      .select(col("subject"), col("predicate"), col("object"), col("ts_us"))
    val objs = graft.graph.TripleStore.objects(t)
    (objs, graft.graph.TripleStore.relationships(t, objs))
  }
}
