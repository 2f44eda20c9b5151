package graft.plans

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSqlSpec extends AnyFunSuite with SparkFixture {

  private def setupViews(): Unit = {
    import spark.implicits._
    Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 300L), (4L, 20L, 500L), (5L, 30L, 900L))
      .toDF("event_id", "user_id", "ts_us").createOrReplaceTempView("ev")
    Seq((10L, 150L), (10L, 300L), (30L, 100L), (30L, 850L), (30L, 899L), (40L, 1L))
      .toDF("user_id", "view_ts_us").createOrReplaceTempView("vw")
  }

  test("ASOF JOIN SQL plans AsOfJoinExec and matches the Dataset API") {
    setupViews()
    val sql = spark.sql(
      """SELECT e.event_id, e.user_id, e.ts_us, v.view_ts_us
        FROM ev e ASOF JOIN vw v
        ON e.user_id = v.user_id AND e.ts_us >= v.view_ts_us
        ORDER BY e.event_id""")
    assert(sql.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      sql.queryExecution.executedPlan.toString.take(1500))
    val api = AsOf.joinBackward(
        spark.table("ev"), spark.table("vw"), Seq("user_id"), "ts_us", "view_ts_us")
      .orderBy("event_id")
    assert(sql.collect().map(_.toString).toSeq == api.collect().map(_.toString).toSeq)
  }

  test("SELECT * resolves: right by column re-exposed as the left value") {
    setupViews()
    val out = spark.sql(
      """SELECT * FROM ev e ASOF JOIN vw v
        ON e.user_id = v.user_id AND e.ts_us >= v.view_ts_us
        ORDER BY e.event_id""")
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts_us", "user_id", "view_ts_us"))
    val rows = out.collect()
    // the duplicated by column always carries the (left) key, including
    // for unmatched rows (pandas merge_asof behavior)
    assert(rows.forall(r => r.getLong(1) == r.getLong(3)))
  }

  test("reversed time comparison (r <= l) and flipped equality both lift") {
    setupViews()
    val out = spark.sql(
      """SELECT e.event_id, v.view_ts_us FROM ev e ASOF JOIN vw v
        ON v.user_id = e.user_id AND v.view_ts_us <= e.ts_us
        ORDER BY e.event_id""")
    assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    assert(out.collect().map(r => if (r.isNullAt(1)) null else r.getLong(1)).toSeq ==
      Seq(null, 150L, 300L, null, 899L))
  }

  test("quoted strings containing 'asof join' are not rewritten") {
    setupViews()
    val out = spark.sql("SELECT 'asof join on x' AS s, count(*) AS n FROM ev")
    assert(out.collect().head.getString(0) == "asof join on x")
  }

  test("ON inside a parenthesized subquery right side is not mis-tagged") {
    setupViews()
    // the inner plain JOIN's ON is at deeper paren depth — the as-of
    // marker must land on the OUTER ON, so the as-of lifts and the
    // inner join stays a plain join (before the depth-aware scanner,
    // the marker landed on the inner ON: outer as-of silently ran as a
    // plain inner join)
    val out = spark.sql(
      """SELECT e.event_id, q.view_ts_us
        FROM ev e ASOF JOIN
          (SELECT v.user_id, v.view_ts_us FROM vw v JOIN ev x ON v.user_id = x.user_id) q
        ON e.user_id = q.user_id AND e.ts_us >= q.view_ts_us
        ORDER BY e.event_id""")
    assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      out.queryExecution.executedPlan.toString.take(1500))
    // user 10 events: backward match among vw(10) views; user 20 has no
    // views (null); user 30 matches 899
    assert(out.collect().map(r => if (r.isNullAt(1)) null else r.getLong(1)).toSeq ==
      Seq(null, 150L, 300L, null, 899L))
  }

  test("an ASOF JOIN that never finds its ON fails the parse loudly") {
    setupViews()
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM ev e ASOF JOIN vw v USING (user_id)").collect())
    assert(e1.getMessage.contains("no ON clause found for ASOF JOIN"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM (SELECT * FROM ev e ASOF JOIN vw v) q ON q.user_id = 1").collect())
    assert(e2.getMessage.contains("no ON clause found for ASOF JOIN"), e2.getMessage)
  }

  test("escaped quotes inside literals do not corrupt depth tracking") {
    // backslash-escaped quote with a bracket in the literal remainder:
    // the skipper must not end the run at \' and count the '(' as depth
    val r1 = AsOfSqlRewrite(
      """SELECT * FROM a ASOF JOIN (SELECT 'O\'Brien (' AS n FROM b) q ON a.k = q.k AND a.t >= q.t""")
    assert(r1.contains("ON graft_asof_marker() AND a.k = q.k"), r1)
    assert(r1.contains("""'O\'Brien ('"""), r1)
    // doubled-quote escape form
    val r2 = AsOfSqlRewrite(
      """SELECT * FROM a ASOF JOIN (SELECT 'O''Brien (' AS n FROM b) q ON a.k = q.k AND a.t >= q.t""")
    assert(r2.contains("ON graft_asof_marker() AND a.k = q.k"), r2)
    assert(r2.contains("'O''Brien ('"), r2)
  }

  test("unsupported ON shapes fail analysis loudly, never run as plain joins") {
    setupViews()
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM ev e ASOF JOIN vw v ON e.user_id = v.user_id").collect())
    assert(e1.getMessage.contains("no time comparison"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      """SELECT * FROM ev e ASOF JOIN vw v
        ON e.user_id = v.user_id AND e.ts_us >= v.view_ts_us AND e.event_id >= v.view_ts_us""").collect())
    assert(e2.getMessage.contains("more than one time comparison"), e2.getMessage)
    // forward as-of (left <= right) is not lifted — and must not
    // silently run as a plain join either
    val e3 = intercept[Exception](spark.sql(
      """SELECT * FROM ev e ASOF JOIN vw v
        ON e.user_id = v.user_id AND e.ts_us <= v.view_ts_us""").collect())
    assert(e3.getMessage.contains("unsupported conjunct"), e3.getMessage)
  }
}
