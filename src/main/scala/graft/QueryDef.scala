package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2: a Spark implementation plus (where the
  * semantics are SQL-expressible) the equivalent ANSI SQL the driver runs
  * in DuckDB over the same parquet tables. Keeping both in one value is
  * what keeps output column names in sync — the driver hash-compares
  * columns sorted by name.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

trait QueryModule {
  def defs: Seq[QueryDef]
}
