package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed dense-id assignment: `row_number() OVER (ORDER BY ...)`
  * semantics without the single-partition WindowExec that an
  * unpartitioned window forces (Spark warns and moves ALL rows to one
  * task — a scale cliff for any dictionary larger than one executor).
  *
  * Instead: range-partitioned global sort, then `zipWithIndex`, which
  * runs one extra lightweight job to count partition sizes and offsets
  * each partition's local indexes — every stage stays distributed and
  * the result is bit-identical to the window form for a total ordering.
  */
object DenseIds {

  /** Append `idCol` = firstId, firstId+1, ... in `order` order. The
    * ordering should be total (tie-free) for deterministic ids.
    *
    * The result is persisted (deserialized, spillable): `zipWithIndex`
    * runs an extra partition-count job per materialization, and id
    * dictionaries are small by design but referenced repeatedly (both
    * sides of an edge join, rank prefixes, ...). Spark's ContextCleaner
    * unpersists it once the DataFrame becomes unreachable.
    */
  def byOrder(df: DataFrame, idCol: String, firstId: Long, order: Column*): DataFrame = {
    val sorted = df.sort(order: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    // zipWithIndex runs TWO jobs (partition-count, then map) over its
    // input; without persisting the sorted RDD the whole upstream
    // pipeline (scan + dedup + range sort) executes twice per dictionary
    // build. ContextCleaner frees it when the dictionary dies.
    val sortedRdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.sparkSession.createDataFrame(
      sortedRdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (firstId + i)) },
      schema).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }
}
