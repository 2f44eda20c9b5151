package graft.logging

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the set-oriented logging tier: create_log's shared format is
  * bit-identical to log_pipeline's inline expression, LEVEL_CUTOFF
  * keeps exactly the at-or-above rows, the factory's three sink types
  * land lines where their reference variants would (file = one
  * directory of lines, daily = one partition directory per log day,
  * reparse-verified), and an unknown type fails loudly with the
  * valid-type list — the Factory.cpp behavior. */
class LoggersSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def lines() = {
    val ev = graft.operators.Tables(spark, dir).events.limit(200)
    ev.select(
      Loggers.createLog(col("ts"),
        when(col("event_type") === "error", "ERROR").otherwise(lit("INFO")),
        lit("KafkaConsumerCallback"),
        concat(lit("event_id="), col("event_id").cast("string"))).as("line"))
      // rotation key must be path-safe: the line's YYYY/MM/DD prefix
      // would URL-encode its slashes as a partition value
      .withColumn("day", translate(substring(col("line"), 1, 10), "/", "-"))
  }

  test("create_log equals log_pipeline's inline format expression") {
    val ev = graft.operators.Tables(spark, dir).events
    val viaLoggers = ev.select(Loggers.createLog(col("ts"), lit("INFO"),
      lit("C"), col("event_type")).as("l")).collect().map(_.getString(0)).sorted
    val inline = ev.select(concat(
      date_format(col("ts"), "yyyy/MM/dd HH:mm:ss.SSSSSS"),
      lit(" [INFO] [C] "), col("event_type")).as("l"))
      .collect().map(_.getString(0)).sorted
    assert(viaLoggers.toSeq == inline.toSeq)
  }

  test("LEVEL_CUTOFF keeps exactly the at-or-above levels; unknown levels never pass") {
    import spark.implicits._
    val df = Seq("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "BOGUS")
      .toDF("level")
    val kept = df.filter(Loggers.atOrAbove(col("level")))
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("INFO", "WARN", "ERROR"))
    val keptAtError = df.filter(Loggers.atOrAbove(col("level"), Loggers.Error))
      .collect().map(_.getString(0)).toSet
    assert(keptAtError == Set("ERROR"))
  }

  test("file sink writes the lines; daily sink rotates by day and reads back partition-pruned") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_logsink").toString
    try {
      val src = lines().persist()
      try {
        val want = src.select("line").collect().map(_.getString(0)).sorted.toSeq
        Loggers.sink("file", s"$tmp/file")(src)
        val gotFile = spark.read.text(s"$tmp/file")
          .collect().map(_.getString(0)).sorted.toSeq
        assert(gotFile == want, "file sink lost or altered lines")
        Loggers.sink("daily", s"$tmp/daily")(src)
        val back = spark.read.text(s"$tmp/daily")
        assert(back.collect().map(_.getString(0)).sorted.toSeq == want,
          "daily sink lost or altered lines")
        // rotation key is a partition column: day dirs exist and a
        // day-filtered read prunes at planning
        val days = src.select("day").distinct().collect().map(_.getString(0))
        assert(days.length > 1, "degenerate fixture: only one log day")
        assert(days.forall(d =>
          graft.operators.IndexFs.exists(s"$tmp/daily/day=$d")),
          "daily sink did not rotate by day")
        val pruned = spark.read.text(s"$tmp/daily")
          .where(col("day") === days.head)
        pruned.collect()
        val scan = pruned.queryExecution.executedPlan.collectLeaves()
          .head.toString
        assert(scan.contains("PartitionFilters:") && scan.contains("day"),
          s"day filter not pruned at planning: ${scan.take(400)}")
        assert(pruned.count() ==
          src.filter(col("day") === days.head).count(),
          "per-day read does not reproduce that day's lines")
      } finally { src.unpersist(); () }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("std_out sink runs without a driver funnel; unknown type fails loudly") {
    Loggers.sink("std_out", "")(lines().limit(5))
    val e = intercept[RuntimeException] { Loggers.sink("syslog", "/tmp/x") }
    assert(e.getMessage.contains("syslog") &&
      e.getMessage.contains("Valid types are: daily, file, std_out"))
  }
}
