package graft.operators

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Pins `q_events_resample` (hourly forward-fill grid) against an
  * independent in-process reference over the shipped events. */
class ResampleSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private val HourUs = 3600000000L

  test("every grid point carries the latest preceding observation, over the series' own support") {
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, dir).events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // reference: per user, walk the sorted series and fill each hour in
    // ((min div h)+1 .. max div h) with the last event at-or-before it
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      val h0 = sorted.head._2 / HourUs
      val h1 = sorted.last._2 / HourUs
      (h0 + 1 to h1).map { h =>
        val cut = h * HourUs
        // event exactly AT the boundary counts (is_grid orders it first)
        val lastObs = sorted.takeWhile(_._2 <= cut).last._3
        (u, cut, lastObs)
      }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q_events_resample")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    // the grid is dense: contiguous hours per user, no fill is missing
    got.groupBy(_._1).foreach { case (u, rs) =>
      val hours = rs.map(_._2 / HourUs)
      assert(hours == (hours.head to hours.last), s"user $u grid has holes")
    }
    assert(got.nonEmpty)
  }

  test("(user_id, us) is unique in every shipped events table — the forward-fill sort key is total") {
    // the window sort key (us, is_grid) per user is only a total order
    // when no two events share a (user_id, us) instant; with a
    // duplicate, Spark and DuckDB could carry DIFFERENT values forward
    // and the oracle equality would break silently on a future testdata
    // regeneration (ADVICE r10 — the property was asserted only in a
    // comment until now)
    import org.apache.spark.sql.functions._
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val dup = Tables(spark, d).events
        .groupBy(col("user_id"), unix_micros(col("ts")).as("us"))
        .count().filter(col("count") > 1).count()
      assert(dup == 0L, s"$d events: $dup duplicated (user_id, ts) instants — " +
        "q_events_resample's forward-fill tie-break is no longer deterministic")
    }
  }

  test("z-score anomalies match exact-moment arithmetic, completely") {
    import org.apache.spark.sql.functions._
    // reference: exact decimal moments per type, then the identical
    // double chain — assert bit-equality of z AND exhaustiveness of the
    // |z| > 3 cut (no flagged row missing, none extra)
    val ev = Tables(spark, "/root/testdata/sf0.001").events
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (tpe, rows) =>
      val sv = rows.map(_._3).sum.toDouble
      val ssq = rows.map(r => r._3 * r._3).sum.toDouble
      val n = rows.length.toLong
      // mirror the operator's degenerate-group guard (the z-chain's
      // own radicand, not an algebraic rearrangement)
      if (n <= 1 || !((ssq - sv * sv / n) / n > 0)) Nil
      else rows.map { case (id, _, v) =>
        val z = (v.toDouble - sv / n) / math.sqrt((ssq - sv * sv / n) / n)
        (id, tpe, v.toDouble, z)
      }.filter(r => math.abs(r._4) > 3.0)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_events_anomaly")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "the heavy-tailed synthetic values should flag some 3-sigma rows")
  }

  test("degenerate groups (single event, constant values) flag nothing instead of Inf/NaN z-scores") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a constant group, a single-event group, and one genuinely spiked
    // group — only the spike may surface, with a finite z
    val e = (Seq((1L, "const", BigDecimal(5.00)), (2L, "const", BigDecimal(5.00)),
        (3L, "lonely", BigDecimal(7.00))) ++
        (10L until 40L).map(i => (i, "spiky", BigDecimal(1.00))) :+
        ((99L, "spiky", BigDecimal(500.00))))
      .toDF("event_id", "event_type", "v")
      .select(col("event_id"), col("event_type"), col("v").cast("decimal(18,2)").as("v"))
    val got = Relational.anomalyZ(e).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    assert(got.forall(r => !r._3.isNaN && !r._3.isInfinite), s"non-finite z: ${got.toSeq}")
    assert(got.map(_._2).toSet == Set("spiky"), s"degenerate group leaked: ${got.toSeq}")
    assert(got.map(_._1).toSeq == Seq(99L))
  }

  test("histogram bins: degenerate min=max pins bin 0, max clamps into bin 9, counts exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // constant group (min = max — the division guard), and a uniform
    // 0..20 group whose exact bin populations an independent floor
    // reproduces (v = 20 must CLAMP into bin 9, not open bin 10)
    val ev = (Seq.fill(4)(("const", 7.5)) ++
      (0 to 20).map(i => ("uniform", i.toDouble)))
      .toDF("event_type", "value")
    val got = Relational.histogramBins(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.filter(_._1 == "const") == Seq(("const", 0L, 4L)))
    val uniform = got.filter(_._1 == "uniform")
    val expected = (0 to 20).map { i =>
      math.min(math.floor((i - 0.0) * 10.0 / 20.0).toLong, 9L)
    }.groupBy(identity).map { case (b, xs) => ("uniform", b, xs.size.toLong) }
      .toSeq.sortBy(_._2)
    assert(uniform == expected)
    assert(uniform.last == (("uniform", 9L, 3L)), "v=max must clamp into the last bin")
    assert(got.map(_._3).sum == 4L + 21L, "every row lands in exactly one bin")
  }
}
