package graft.logging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's logging tier (`/root/reference/src/logging/`)
  * re-expressed set-oriented — closing the last "trivial variants"
  * entry on the VERDICT missing list. The reference pieces and their
  * Spark placements:
  *
  *  - `create_log` (Logging.h:177–189): the ONE line format every
  *    logger variant shares — timestamp + " [LEVEL] " + "[name] " +
  *    message. Here a codegen'd Column ([[createLog]]) — the format
  *    `log_pipeline` already round-trips against its DuckDB oracle.
  *  - `LEVEL_CUTOFF` (Logging.h:41–58): compile-time level filtering —
  *    every variant drops `level < LEVEL_CUTOFF` BEFORE formatting.
  *    Here a codegen'd predicate ([[atOrAbove]]) the `log_level_cutoff`
  *    QueryDef oracle-checks.
  *  - `Factory` (Factory.cpp:1–43): config-type-dispatched logger
  *    construction ("std_out" / "file" / "daily"), failing LOUDLY with
  *    the valid-type list on an unknown type. Here [[sink]].
  *  - `StdOutLogger` (StdOutLogger.cpp): console sink. The set-oriented
  *    analog prints per EXECUTOR (foreachPartition → task stdout) —
  *    the one-<<-call-per-line thread-safety note in the reference is
  *    exactly why the distributed analog must not funnel lines through
  *    the driver.
  *  - `SpdLogger` (SpdLogger.cpp, the "daily" type): stdout + a daily
  *    file rotated at hour:minute. Set-oriented, rotation-by-time
  *    becomes PARTITION-BY-DAY: one directory per log day, which is
  *    also what a 100 TB pipeline wants (day-pruned log scans).
  *  - `FileLogger` (FileLogger.cpp): single-file append sink.
  *
  * Level order is the reference's: TRACE < DEBUG < INFO < WARN <
  * ERROR; the default cutoff is INFO (Logging.h:56–58, the no-flag
  * build).
  */
object Loggers {

  sealed abstract class Level(val rank: Int, val name: String)
  case object Trace extends Level(0, "TRACE")
  case object Debug extends Level(1, "DEBUG")
  case object Info extends Level(2, "INFO")
  case object Warn extends Level(3, "WARN")
  case object Error extends Level(4, "ERROR")

  val Levels: Seq[Level] = Seq(Trace, Debug, Info, Warn, Error)

  /** The default `LEVEL_CUTOFF` (Logging.h:56–58). */
  val DefaultCutoff: Level = Info

  /** `create_log`'s line, as a codegen'd expression: `ts` formatted to
    * the flycatcher micros format, then " [LEVEL] [name] message". */
  def createLog(ts: Column, level: Column, name: Column, message: Column): Column =
    concat(date_format(ts, "yyyy/MM/dd HH:mm:ss.SSSSSS"),
      lit(" ["), level, lit("] ["), name, lit("] "), message)

  /** Numeric rank of a level-name column (unknown names rank -1 and
    * never pass any cutoff — the factory's loudness belongs to types,
    * not per-row data). */
  def levelRank(level: Column): Column =
    Levels.foldLeft(lit(-1)) { (acc, l) =>
      when(level === lit(l.name), lit(l.rank)).otherwise(acc)
    }

  /** The `level < LEVEL_CUTOFF → drop` predicate, kept side. */
  def atOrAbove(level: Column, cutoff: Level = DefaultCutoff): Column =
    levelRank(level) >= lit(cutoff.rank)

  /** Factory.create (Factory.cpp:17–43): type → sink over a frame of
    * formatted lines. `file` expects a `line` column; `daily`
    * additionally a `day` column (the rotation key). Unknown types
    * fail loudly with the valid-type list, the reference's message
    * shape. */
  def sink(tpe: String, outDir: String): DataFrame => Unit = tpe match {
    case "std_out" => df =>
      // executor-local stdout: one println per line per task — the
      // distributed reading of StdOutLogger's "only call << once"
      // note; never a driver-side funnel
      df.select(col("line")).foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          rows.foreach(r => println(r.getString(0)))
      }
    case "file" => df =>
      df.select(col("line")).write.mode("overwrite").text(outDir)
    case "daily" => df =>
      // rotation-by-day as partition-by-day: SpdLogger's daily file
      // sink, with the rotation key a partition column so reads prune
      df.select(col("day"), col("line"))
        .repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").text(outDir)
    case other =>
      sys.error(s"Couldn't produce logger for type: '$other'. " +
        "Valid types are: daily, file, std_out")
  }
}
