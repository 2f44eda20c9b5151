package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode}

/** Write-side scale plumbing (the 100 TB story is as much about how data
  * lands as how it's read):
  *
  *  - `partitioned`: hive-style directory partitioning — readers prune
  *    whole partitions at planning time (PlanShapeSpec proves the
  *    pruning), and the layout is append-friendly for daily/hourly
  *    ingest (the reference's daily log files, reborn as partitions).
  *  - `bucketed`: pre-shuffled table layout — each bucket holds one hash
  *    slice of the join/agg key, so a join of two tables bucketed on the
  *    same key by the same count plans with NO exchange on either side
  *    (SinksSpec proves the shuffle-free join). At 100 TB this converts
  *    every recurring fact-fact join on the bucket key from a full
  *    shuffle into a local zip of bucket files.
  *  - `sortedBuckets`: additionally sorts within buckets, enabling
  *    sort-merge joins without the per-task sort.
  *
  * Bucketing writes through the session catalog (`saveAsTable`) because
  * bucket metadata lives in the metastore — plain `parquet(path)` cannot
  * carry it.
  */
object Sinks {

  /** Directory-partitioned parquet at `path`, partitioned by `cols`. */
  def partitioned(df: DataFrame, path: String, cols: Seq[String],
                  mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(cols: _*).parquet(path)

  /** Hash-bucketed catalog table `table`, bucketed by `cols` into
    * `numBuckets` buckets. */
  def bucketed(df: DataFrame, table: String, cols: Seq[String], numBuckets: Int,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, cols.head, cols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Bucketed AND sorted-within-buckets table — sort-merge joins read it
    * without re-sorting. Caveat (SinksSpec exercises it): since Spark 3.0
    * the scan only exposes the bucket sort order when
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` AND each
    * bucket holds exactly one file — keep writers at one task per bucket
    * (coalesce before writing) if the sort elimination matters. */
  def sortedBuckets(df: DataFrame, table: String, cols: Seq[String], numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
