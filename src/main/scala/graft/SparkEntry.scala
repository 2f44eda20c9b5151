package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator module (SURVEY.md §2) into the
  * `queries` / `oracleSql` maps the driver's correctness gate consumes.
  */
object SparkEntry {

  /** All operator modules, in SURVEY.md §2 order. */
  def modules: Seq[QueryModule] = Seq(
    graft.avro.AvroQueries,
    graft.operators.Relational,
    graft.graph.GraphQueries,
    graft.textfn.TextQueries,
    graft.dedup.Dedup,
    graft.similarity.Similarity,
    graft.multimodal.Multimodal,
    graft.pipeline.CorpusOps
  )

  def allDefs: Seq[QueryDef] = modules.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The flagship is the reference's core path: Kafka-shaped topic log ->
    * CP1 unframe -> Avro decode -> aggregate. */
  def entry(spark: SparkSession): DataFrame =
    queries("avro_roundtrip_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
