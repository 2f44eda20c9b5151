package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * One `DataFrame` per table; plain `spark.read.parquet` so Catalyst sees
  * the native parquet relation (filter/column pushdown, partition
  * coalescing). Nothing is cached here — at 100 TB the scan IS the plan,
  * and each query should prune its own columns/rows.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")

  /** `events.ts` has shipped in two vintages of the driver's generator:
    * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * read nanos as long via the legacy conf and floor-convert to micros,
    * the same truncation DuckDB applies) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which Spark reads as TIMESTAMP_NTZ.
    * Dispatch on the type the reader actually produced and normalize to
    * a session-tz TIMESTAMP: every consumer (`unix_micros`, window(),
    * as-of arithmetic) and the DuckDB oracle (`epoch_us`) then sees the
    * identical micros instant, because the session timezone is pinned
    * UTC by every entrypoint.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
