package graft.plans

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkFixture {

  test("backward as-of join: edge cases (no prior, exact tie, multiple keys)") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L),  // user 10: before any right row -> null
      (2L, 10L, 200L),  // matches right at 150
      (3L, 10L, 300L),  // exact tie at 300 included (<=)
      (4L, 20L, 500L),  // user 20 has no right rows at all
      (5L, 30L, 900L)   // user 30: latest of several
    ).toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (10L, 150L), (10L, 300L),
      (30L, 100L), (30L, 850L), (30L, 899L),
      (40L, 1L)    // right-only key never emitted
    ).toDF("user_id", "view_ts_us")

    val out = AsOf.joinBackward(left, right, Seq("user_id"), "ts_us", "view_ts_us")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 10L, 100L, null),
      (2L, 10L, 200L, 150L),
      (3L, 10L, 300L, 300L),
      (4L, 20L, 500L, null),
      (5L, 30L, 900L, 899L)))
  }

  test("null by-keys and null times never match (SQL equi-join semantics)") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(10L), Some(200L)), // normal match
      (2L, None, Some(200L)),      // null key -> no match even vs null-key right
      (3L, Some(10L), None),       // null time -> no match
      (4L, Some(50L), Some(900L))  // only right rows for 50 are null-timed -> no match
    ).toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (Some(10L), Some(150L)),
      (None, Some(100L)),          // null-key right row must never be stored
      (Some(50L), None)            // null-time right row must never be stored
    ).toDF("user_id", "view_ts_us")
    val out = AsOf.joinBackward(left, right, Seq("user_id"), "ts_us", "view_ts_us")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getLong(3)))
    assert(out.toSeq == Seq((1L, 150L), (2L, null), (3L, null), (4L, null)))
  }

  test("native as-of equals the correlated-max formulation on real events") {
    val dir = "/root/testdata/sf0.01"
    val ev = graft.operators.Tables(spark, dir).events
      .withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("view_ts_us"))

    val native = AsOf.joinBackward(purchases, views, Seq("user_id"), "ts_us", "view_ts_us")
      .orderBy("event_id").collect()

    // independent formulation: max prior view ts via a plain join + agg
    val expected = purchases.as("p")
      .join(views.as("v"),
        col("p.user_id") === col("v.user_id") && col("v.view_ts_us") <= col("p.ts_us"),
        "left")
      .groupBy(col("p.event_id").as("event_id"), col("p.user_id").as("user_id"),
        col("p.ts_us").as("ts_us"))
      .agg(max(col("v.view_ts_us")).as("view_ts_us"))
      .orderBy("event_id").collect()

    assert(native.length == expected.length && native.length > 0)
    native.zip(expected).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("as-of tolerance nulls out stale matches") {
    import spark.implicits._
    val left = Seq((1L, 10L, 1000L), (2L, 10L, 2000L)).toDF("event_id", "user_id", "ts_us")
    val right = Seq((10L, 900L)).toDF("user_id", "view_ts_us")
    val out = AsOf.joinBackward(left, right, Seq("user_id"), "ts_us", "view_ts_us",
        toleranceUs = Some(500L))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getLong(3)))
    // 1000-900=100 within tolerance; 2000-900=1100 stale -> null
    assert(out.toSeq == Seq((1L, 900L), (2L, null)))
  }

  test("left-only filters push below the as-of join into the scan") {
    val dir = "/root/testdata/sf0.01"
    val ev = graft.operators.Tables(spark, dir).events
      .withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("view_ts_us"))
    val joined = AsOf.joinBackward(purchases, views, Seq("user_id"), "ts_us", "view_ts_us")
      .filter(col("event_id") < 500L)
    val optimized = joined.queryExecution.optimizedPlan
    // the filter must sit BELOW the AsOfJoin node after optimization
    val asOf = optimized.collectFirst { case a: AsOfJoin => a }.get
    assert(asOf.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.map(_.name).toSet.contains("event_id") => f
    }.nonEmpty, s"filter not pushed:\n$optimized")
    // and results are unchanged vs filtering before the join
    val expected = AsOf.joinBackward(purchases.filter(col("event_id") < 500L), views,
      Seq("user_id"), "ts_us", "view_ts_us").orderBy("event_id").collect()
    val got = joined.orderBy("event_id").collect()
    assert(got.toSeq == expected.toSeq && got.nonEmpty)
  }

  test("as-of join self-join sources get disambiguated") {
    import spark.implicits._
    val base = Seq((1L, 5L, 100L), (2L, 5L, 50L)).toDF("event_id", "user_id", "ts_us")
    val l = base.filter(col("event_id") === 1L)
    val r = base.filter(col("event_id") === 2L)
      .select(col("user_id"), col("ts_us").as("r_ts_us"))
    val out = AsOf.joinBackward(l, r, Seq("user_id"), "ts_us", "r_ts_us").collect()
    assert(out.toSeq == Seq(Row(1L, 5L, 100L, 50L)))
  }
}
