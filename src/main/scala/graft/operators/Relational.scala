package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Exact._

/** Relational analytics suite (SURVEY.md §2.3) over the TPC-H-ish tables.
  *
  * Design notes for scale (see SURVEY.md §4):
  *  - dimension tables (region/nation/supplier/part/customer at TPC-H
  *    ratios) are joined with an explicit `broadcast()` hint — at 100 TB
  *    the fact side never shuffles for those joins;
  *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key and
  *    lean on AQE for skew/coalescing;
  *  - all money aggregates are decimal-exact (see [[Exact]]) so results
  *    hash-match the DuckDB oracle bit-for-bit.
  */
object Relational extends QueryModule {

  /** ep * (1 - disc), decimal-exact, scale 4. */
  private def discPrice: Column =
    (col("l_extendedprice").cast(Money) * (lit(1).cast(Money) - col("l_discount").cast(Money)))
      .cast(org.apache.spark.sql.types.DecimalType(18, 4))

  private val discPriceSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"

  private def revenue: Column = sum(discPrice).cast("double")
  private val revenueSql = s"CAST(SUM($discPriceSql) AS DOUBLE)"

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q1_pricing_summary",
      (s, dir) => {
        Tables(s, dir).lineitem
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(discPrice).cast("double").as("sum_disc_price"),
            sum(discPrice * (lit(1).cast(Money) + col("l_tax").cast(Money))).cast("double").as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlSum("l_quantity")} AS sum_qty,
        ${sqlSum("l_extendedprice")} AS sum_base_price,
        CAST(SUM($discPriceSql) AS DOUBLE) AS sum_disc_price,
        CAST(SUM($discPriceSql * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        ${sqlAvg("l_quantity")} AS avg_qty,
        ${sqlAvg("l_extendedprice")} AS avg_price,
        ${sqlAvg("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
    ),

    QueryDef(
      "q3_shipping_priority",
      (s, dir) => {
        val t = Tables(s, dir)
        val c = t.customer.filter(col("c_mktsegment") === "BUILDING")
        val o = t.orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = t.lineitem.filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(revenue.as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $revenueSql AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")
    ),

    QueryDef(
      "q5_local_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .join(t.orders.filter(
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some(s"""SELECT r_name, n_name, $revenueSql AS revenue, COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")
    ),

    QueryDef(
      "q6_forecast_revenue",
      (s, dir) => {
        Tables(s, dir).lineitem
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
              col("l_quantity") < 24)
          .agg(
            sum(col("l_extendedprice").cast(Money) * col("l_discount").cast(Money))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount >= 0.04 AND l_discount <= 0.06 AND l_quantity < 24""")
    ),

    QueryDef(
      "q_top_customers",
      (s, dir) => {
        val t = Tables(s, dir)
        val rev = t.orders
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast(Money)).cast("double").as("cust_revenue"))
        val w = Window.partitionBy(col("n_name")).orderBy(col("cust_revenue").desc, col("c_custkey"))
        rev
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("n_name"), col("c_name"), col("cust_revenue"), col("rk"))
          .orderBy(col("n_name"), col("rk"))
      },
      Some("""WITH rev AS (
        SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cust_revenue
        FROM orders GROUP BY o_custkey)
      SELECT n_name, c_name, cust_revenue, rk FROM (
        SELECT n_name, c_name, cust_revenue,
          CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY cust_revenue DESC, c_custkey) AS BIGINT) AS rk
        FROM rev JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey) x
      WHERE rk <= 3 ORDER BY n_name, rk""")
    ),

    QueryDef(
      "q_order_priority",
      (s, dir) => {
        val t = Tables(s, dir)
        val late = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
        t.orders
          .join(late,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "leftsemi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    ),

    QueryDef(
      "q_parts_not_ordered",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part
          .join(
            t.lineitem
              .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
              .select(col("l_partkey")),
            col("p_partkey") === col("l_partkey"), "leftanti")
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_unordered"),
            sum(col("p_retailprice").cast(Money)).cast("double").as("shelf_value"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, COUNT(*) AS n_unordered,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS shelf_value
      FROM part WHERE NOT EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
      GROUP BY p_brand ORDER BY p_brand""")
    ),

    QueryDef(
      "q_rollup_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_name"), col("o_orderstatus"))
          .agg(sum(col("o_totalprice").cast(Money)).cast("double").as("total_revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
      },
      Some("""SELECT n_name, o_orderstatus,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        COUNT(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, o_orderstatus)
      ORDER BY n_name ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""")
    ),

    QueryDef(
      "q_distinct_custs",
      (s, dir) => {
        Tables(s, dir).orders
          .groupBy(col("o_orderstatus"))
          .agg(
            countDistinct(col("o_custkey")).as("n_custs"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    ),

    QueryDef(
      "q_union_activity",
      (s, dir) => {
        val t = Tables(s, dir)
        val c = t.customer.select(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
          lit("customer").as("kind"))
        val sup = t.supplier.select(col("s_name").as("name"), col("s_acctbal").as("acctbal"),
          lit("supplier").as("kind"))
        c.unionByName(sup)
          .groupBy(col("kind"))
          .agg(count(lit(1)).as("n_accounts"),
            sum(col("acctbal").cast(Money)).cast("double").as("total_balance"),
            countDistinct(col("name")).as("n_names"))
          .orderBy(col("kind"))
      },
      Some("""SELECT kind, COUNT(*) AS n_accounts,
        CAST(SUM(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
        COUNT(DISTINCT name) AS n_names
      FROM (
        SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier)
      GROUP BY kind ORDER BY kind""")
    ),

    QueryDef(
      "q_case_bucketing",
      (s, dir) => {
        Tables(s, dir).orders
          .withColumn("bucket",
            when(col("o_totalprice") < 50000, "small")
              .when(col("o_totalprice") < 200000, "medium")
              .otherwise("large"))
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("n_urgent"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
            sum(col("o_totalprice").cast(Money)).cast("double").as("total_price"))
          .orderBy(col("bucket"))
      },
      Some("""SELECT bucket, COUNT(*) AS n_orders,
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM (SELECT *, CASE WHEN o_totalprice < 50000 THEN 'small'
                           WHEN o_totalprice < 200000 THEN 'medium'
                           ELSE 'large' END AS bucket FROM orders)
      GROUP BY bucket ORDER BY bucket""")
    ),

    QueryDef(
      "q_supplier_pareto",
      // REVENUE CONCENTRATION per nation (the 80/20 read behind vendor
      // risk / mixture audits): how many suppliers carry 80% of a
      // nation's revenue, and how dominant is the top one. Supplier
      // revenues are exact Money decimals (the §5 discipline); the
      // cumulative runs per nation over SUPPLIER-level aggregates
      // (bounded groups — never a window over lineitem), and the 80%
      // crossing is a PURE DECIMAL comparison, 10·(cum − rev) <
      // 8·total — no float threshold, no rounding, so the count is
      // exact in both engines. A supplier is "needed" when the
      // cumulative BEFORE it had not yet reached 80% — this counts the
      // crossing supplier in, which is the standard Pareto-k.
      (s, dir) => {
        val t = Tables(s, dir)
        val revPerSupp = t.lineitem
          .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
          .join(t.nation, col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("s_suppkey"))
          // the ONE money rule (discPrice) — review finding r13: a
          // first draft inlined its own copy of the decimal chain
          .agg(sum(discPrice).as("rev"))
        val wOrd = Window.partitionBy(col("n_name"))
          .orderBy(col("rev").desc, col("s_suppkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("n_name"))
        revPerSupp
          .withColumn("cum", sum(col("rev")).over(wOrd))
          .withColumn("total", sum(col("rev")).over(wAll))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_suppliers"),
            max(col("total")).as("total_dec"),
            sum(when(lit(10) * (col("cum") - col("rev")) < lit(8) * col("total"),
              1L).otherwise(0L)).as("n_for_80pct"),
            max(col("rev")).as("top_dec"))
          .select(col("n_name").as("nation"), col("n_suppliers"),
            col("total_dec").cast("double").as("total_revenue"),
            col("n_for_80pct"),
            (col("top_dec").cast("double") / col("total_dec").cast("double"))
              .as("top1_share"))
          .orderBy(col("nation"))
      },
      Some(s"""WITH r AS (
        SELECT n.n_name AS nation, s.s_suppkey,
          SUM($discPriceSql) AS rev
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      c AS (SELECT nation, rev,
          SUM(rev) OVER (PARTITION BY nation ORDER BY rev DESC, s_suppkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          SUM(rev) OVER (PARTITION BY nation) AS total
        FROM r)
      SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        CAST(MAX(total) AS DOUBLE) AS total_revenue,
        CAST(SUM(CASE WHEN 10 * (cum - rev) < 8 * total THEN 1 ELSE 0 END) AS BIGINT) AS n_for_80pct,
        CAST(MAX(rev) AS DOUBLE) / CAST(MAX(total) AS DOUBLE) AS top1_share
      FROM c GROUP BY nation ORDER BY nation""")
    ),

    QueryDef(
      "q_events_paths",
      // TOP USER JOURNEYS — the 3-step path census behind every "how do
      // users actually reach purchase/error" analysis (q_events_markov's
      // first-order matrix forgets history; 3-step paths expose it).
      // TWO leads over the SAME (user, ts, event_id) window — one
      // window exec, one pass over events — then a types³-bounded count
      // and a TakeOrdered top-20 (count DESC, path ASC): nothing
      // downstream of the window scales with events.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables(s, dir).events
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .filter(col("t3").isNotNull)
          .groupBy(col("event_type").as("s1"), col("t2").as("s2"), col("t3").as("s3"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
          .limit(20)
      },
      Some("""WITH seq AS (
        SELECT event_type AS s1,
          lead(event_type, 1) OVER w AS s2,
          lead(event_type, 2) OVER w AS s3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE s3 IS NOT NULL
      GROUP BY s1, s2, s3
      ORDER BY n DESC, s1, s2, s3 LIMIT 20""")
    ),

    QueryDef(
      "q_events_markov",
      // EVENT-TYPE TRANSITION MATRIX — the first-order Markov model of
      // user behavior (what follows what: the "view → purchase vs
      // view → error" read funnels summarize and this generalizes).
      // Per user, consecutive event pairs under the house (ts,
      // event_id) total order via ONE lead() window — the sessionize
      // plan shape, no self-join; then a types² count aggregate and a
      // per-from-type window over the TYPES²-sized count frame (never
      // the events). p = n/n_from is one IEEE division of exact longs —
      // bit-identical cross-engine, no rounding needed.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val counts = Tables(s, dir).events
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val wf = Window.partitionBy(col("from_type"))
        counts
          .withColumn("n_from", sum(col("n")).over(wf))
          .select(col("from_type"), col("to_type"), col("n"),
            (col("n").cast("double") / col("n_from").cast("double")).as("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH seq AS (
        SELECT event_type,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events),
      counts AS (
        SELECT event_type AS from_type, next_type AS to_type,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      FROM counts ORDER BY from_type, to_type""")
    ),

    QueryDef(
      "q_events_sessionize",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables(s, dir).events
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"))
          .groupBy(col("user_id"))
          .agg(
            max(col("session_id")).as("n_sessions"),
            max(col("n_events")).as("max_session_events"),
            count(lit(1)).as("n_sessions_check"))
          .orderBy(col("user_id"))
      },
      Some("""WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged),
      per_session AS (
        SELECT user_id, session_id, COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, session_id)
      SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
        MAX(n_events) AS max_session_events, COUNT(*) AS n_sessions_check
      FROM per_session GROUP BY user_id ORDER BY user_id""")
    ),

    QueryDef(
      "q_events_window",
      (s, dir) => {
        Tables(s, dir).events
          .groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"),
            sum(col("value").cast(Money)).cast("double").as("total_value"))
          .orderBy(col("hour"))
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY date_trunc('hour', ts) ORDER BY hour""")
    ),

    QueryDef(
      "q_events_topk_users",
      (s, dir) => {
        val totals = Tables(s, dir).events
          .groupBy(col("user_id"))
          .agg(sum(col("value").cast(Money)).cast("double").as("total_value"),
            count(lit(1)).as("n_events"))
        // dense_rank <= 5 needs a global ordering; prefilter to the top-5
        // distinct totals (distributed TakeOrdered + 1-row broadcast) so
        // the unavoidable rank window runs over only the tied head, not
        // every user — the pattern survives arbitrary user cardinality
        val thr = totals.select(col("total_value")).distinct()
          .orderBy(col("total_value").desc).limit(5)
          .agg(min(col("total_value")).as("thr"))
        val w = Window.orderBy(col("total_value").desc)
        totals
          .join(broadcast(thr), col("total_value") >= col("thr"))
          .withColumn("rk", dense_rank().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("user_id"), col("total_value"), col("n_events"), col("rk"))
          .orderBy(col("rk"), col("user_id"))
      },
      Some("""SELECT user_id, total_value, n_events, rk FROM (
        SELECT user_id, total_value, n_events, CAST(DENSE_RANK() OVER (ORDER BY total_value DESC) AS BIGINT) AS rk
        FROM (SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
                COUNT(*) AS n_events
              FROM events GROUP BY user_id) t) r
      WHERE rk <= 5 ORDER BY rk, user_id""")
    ),

    QueryDef(
      // exact interpolated percentiles (Spark `percentile` == DuckDB
      // `quantile_cont`: same two order statistics, same lerp)
      "q_median_order",
      (s, dir) => {
        Tables(s, dir).orders
          .groupBy(col("o_orderpriority"))
          .agg(
            expr("percentile(o_totalprice, 0.5)").as("median_price"),
            expr("percentile(o_totalprice, 0.9)").as("p90_price"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
        quantile_cont(o_totalprice, 0.5) AS median_price,
        quantile_cont(o_totalprice, 0.9) AS p90_price,
        COUNT(*) AS n_orders
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    ),

    QueryDef(
      // HLL sketch vs exact cardinality: approx results aren't
      // cross-engine stable, so rows-only; QueriesSmokeSpec bounds the
      // relative error. This is the 100 TB path for distinct counting —
      // mergeable sketch, no giant shuffle of raw keys.
      "q_approx_distinct",
      (s, dir) => {
        // The sketch and the exact count aggregate SEPARATELY, joined on
        // the 3-row group key: one combined agg forces the HLL buffer
        // (411 longs) through the count-distinct expand rewrite's
        // per-(flag, orderkey) partial aggregate — ~150k groups each
        // dragging the full sketch, measured 2.8 s vs 0.6 s split. (The
        // old combined form benched fast only because count() pruned
        // the unused aggregate expressions; the quality gate below
        // makes every run compute what the query claims to compute.)
        val li = Tables(s, dir).lineitem
        val approx = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
        val exact = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
        approx.join(exact, "l_returnflag")
          // driver-visible quality gate: the measured relative error is
          // an output COLUMN and a row violating the spec bound (the
          // same 0.05 QueriesSmokeSpec asserts) vanishes — a sketch
          // collapse flips the rows-only check instead of hiding in
          // specs
          .withColumn("rel_err",
            abs(col("approx_orders") - col("exact_orders")).cast("double") /
              col("exact_orders").cast("double"))
          .filter(col("rel_err") < 0.05)
          .orderBy(col("l_returnflag"))
      },
      None
    ),

    QueryDef(
      // The OTHER mergeable sketch a 100 TB aggregation layer needs
      // beside HLL: approximate percentiles. approx_percentile is
      // Spark's KLL-style quantile summary — map-side partial sketches
      // merge associatively, so the shuffle carries one sketch per
      // group per partition, never the value multiset (an exact
      // percentile shuffles every row to its group, which is why
      // q_median_order is the small-group path and THIS is the scale
      // path). Approximate by design → rows-only in the driver gate;
      // the accuracy bound vs the exact percentile is spec-asserted
      // (QueriesSmokeSpec), mirroring q_approx_distinct's discipline.
      "q_approx_quantiles",
      (s, dir) => {
        // driver-visible quality gate: the sound RANK-space envelope
        // (QueriesSmokeSpec's exact order statistics at p±0.05, discrete
        // ranks — an interpolated envelope is unsound for small groups)
        // rides the output as [lo, hi] columns, and a group whose
        // sketch escapes its envelope vanishes, flipping the driver's
        // rows-only check. sort_array(collect_list) is gate
        // instrumentation on the SAME per-group value multiset the
        // exact-percentile columns already shuffle — the sketch columns
        // alone remain the 100 TB path.
        def rankStat(idx: org.apache.spark.sql.Column) =
          element_at(col("vals"), (idx.cast("int") + 1))
        Tables(s, dir).orders
          .groupBy(col("o_orderpriority"))
          .agg(
            percentile_approx(col("o_totalprice"), lit(0.5), lit(2500)).as("p50_approx"),
            percentile_approx(col("o_totalprice"), lit(0.95), lit(2500)).as("p95_approx"),
            expr("percentile(o_totalprice, 0.5)").as("p50_exact"),
            expr("percentile(o_totalprice, 0.95)").as("p95_exact"),
            count(lit(1)).as("n_orders"),
            sort_array(collect_list(col("o_totalprice"))).as("vals"))
          .withColumn("p50_lo", rankStat(floor((col("n_orders") - 1) * lit(0.45))))
          .withColumn("p50_hi", rankStat(least(
            (col("n_orders") - 1).cast("double"),
            ceil((col("n_orders") - 1) * lit(0.55)))))
          .withColumn("p95_lo", rankStat(floor((col("n_orders") - 1) * lit(0.90))))
          .withColumn("p95_hi", rankStat(least(
            (col("n_orders") - 1).cast("double"),
            ceil((col("n_orders") - 1) * lit(1.0)))))
          .filter(col("p50_approx").between(col("p50_lo"), col("p50_hi")) &&
            col("p95_approx").between(col("p95_lo"), col("p95_hi")))
          .drop("vals")
          .orderBy(col("o_orderpriority"))
      },
      None
    ),

    QueryDef(
      // stream-enrichment shape: fact stream joined to a broadcast
      // dimension, then aggregated
      "q_enrich_events",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .join(broadcast(t.customer), col("user_id") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_events"),
            Exact.dsum(col("value")).as("total_value"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_events,
        ${Exact.sqlSum("value")} AS total_value,
        COUNT(DISTINCT user_id) AS n_users
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    ),

    QueryDef(
      // skew-mitigation pattern made checkable: salt the hot grouping key
      // (5 event types over any number of rows), partial-aggregate per
      // (key, salt), merge per key. Decimal sums are associative, so the
      // result equals the direct aggregation bit-for-bit — which is
      // exactly what the oracle checks.
      "q_salted_agg",
      (s, dir) => {
        Tables(s, dir).events
          .withColumn("salt", pmod(col("event_id"), lit(16)).cast("int"))
          .groupBy(col("event_type"), col("salt"))
          .agg(sum(col("value").cast(Money)).as("pv"), count(lit(1)).as("pn"))
          .groupBy(col("event_type"))
          .agg(sum(col("pv")).cast("double").as("total_value"), sum(col("pn")).as("n_events"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type, ${Exact.sqlSum("value")} AS total_value,
        COUNT(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type""")
    ),

    QueryDef(
      // GROUPING SETS through the SQL surface (spark.sql over temp
      // views), with grouping_id to disambiguate the null rows
      "q_grouping_sets",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders.createOrReplaceTempView("orders_v")
        s.sql(s"""SELECT o_orderstatus, o_orderpriority,
            CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
            COUNT(*) AS n_orders,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
          FROM orders_v
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY gid, o_orderstatus, o_orderpriority""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
          CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus, o_orderpriority""")
    ),

    QueryDef(
      // correlated scalar subquery: orders more than double their
      // customer's average order value
      "q_above_cust_avg",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders.createOrReplaceTempView("orders_v")
        // decimal-exact per-customer average: double SUM order is
        // partition-count-dependent in Spark and differs from DuckDB, so
        // a plain AVG could flip the boundary predicate on low-bit drift
        s.sql("""SELECT o_custkey, COUNT(*) AS n_big_orders,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS big_total
          FROM orders_v o
          WHERE o_totalprice > 2 * (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM orders_v i WHERE i.o_custkey = o.o_custkey)
          GROUP BY o_custkey ORDER BY o_custkey""")
      },
      Some("""SELECT o_custkey, COUNT(*) AS n_big_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS big_total
        FROM orders o
        WHERE o_totalprice > 2 * (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM orders i WHERE i.o_custkey = o.o_custkey)
        GROUP BY o_custkey ORDER BY o_custkey""")
    ),

    QueryDef(
      "q_asof_join",
      (s, dir) => {
        val ev = Tables(s, dir).events
          .filter(col("event_type").isin("view", "purchase"))
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        ev
          .withColumn("view_ts",
            last(when(col("event_type") === "view", col("ts")), ignoreNulls = true).over(byUser))
          .filter(col("event_type") === "purchase")
          .withColumn("gap_us",
            when(col("view_ts").isNotNull, unix_micros(col("ts")) - unix_micros(col("view_ts"))))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_purchases"),
            count(col("gap_us")).as("n_matched"),
            sum(col("gap_us")).as("total_gap_us"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ev AS (
        SELECT user_id, ts, event_id, event_type,
          LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts
        FROM events WHERE event_type IN ('view', 'purchase'))
      SELECT user_id, COUNT(*) AS n_purchases,
        COUNT(CASE WHEN view_ts IS NOT NULL THEN 1 END) AS n_matched,
        CAST(SUM(CASE WHEN view_ts IS NOT NULL THEN epoch_us(ts) - epoch_us(view_ts) END) AS BIGINT) AS total_gap_us
      FROM ev WHERE event_type = 'purchase'
      GROUP BY user_id ORDER BY user_id""")
    ),

    QueryDef(
      // true relational PIVOT (not just conditional aggregation): order
      // counts per status, one column per priority, with an explicit
      // pivot-value list so the output schema is static (at scale an
      // implicit pivot triggers a distinct-values collect first)
      "q_pivot_priority",
      (s, dir) => {
        val renames = Seq(
          "1-URGENT" -> "n1_urgent", "2-HIGH" -> "n2_high", "3-MEDIUM" -> "n3_medium",
          "4-NOT SPECIFIED" -> "n4_notspec", "5-LOW" -> "n5_low")
        val pivoted = Tables(s, dir).orders
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority", renames.map(_._1))
          .agg(count(lit(1)))
        renames.foldLeft(pivoted) { case (df, (from, to)) => df.withColumnRenamed(from, to) }
          .na.fill(0L, renames.map(_._2))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
        COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n1_urgent,
        COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n2_high,
        COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS n3_medium,
        COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS n4_notspec,
        COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n5_low
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    ),

    QueryDef(
      // ntile: decile assignment over customer revenue with summary
      // stats per decile. NTILE needs a GLOBAL ordering, which as a
      // window would move every row to one task — instead the global
      // rank comes from the distributed sort+zipWithIndex dictionary
      // (DenseIds) and the decile is recomputed from (rank, n) with
      // NTILE's exact ceil/floor bucket-size rule, so the result is
      // bit-identical to the oracle's NTILE(10) while every stage stays
      // partitioned.
      "q_ntile_revenue",
      (s, dir) => {
        val rev = Tables(s, dir).orders
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast(Money)).cast("double").as("cust_revenue"))
        // rank FIRST: byOrder persists its output, so counting the
        // ranked frame costs one job instead of re-running the orders
        // aggregate (the NTILE arithmetic itself is plan-time)
        val ranked = DenseIds.byOrder(rev, "rk", 1L,
          col("cust_revenue").desc, col("o_custkey"))
        val n = ranked.count()
        ntileBucket(ranked, "rk", "decile", n, buckets = 10L)
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_custs"),
            sum(col("cust_revenue").cast(Money)).cast("double").as("decile_revenue"),
            min(col("cust_revenue")).as("min_revenue"))
          .orderBy(col("decile"))
      },
      Some("""WITH rev AS (
        SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cust_revenue
        FROM orders GROUP BY o_custkey),
      d AS (SELECT o_custkey, cust_revenue,
        CAST(NTILE(10) OVER (ORDER BY cust_revenue DESC, o_custkey) AS BIGINT) AS decile FROM rev)
      SELECT decile, COUNT(*) AS n_custs,
        CAST(SUM(CAST(cust_revenue AS DECIMAL(18,2))) AS DOUBLE) AS decile_revenue,
        MIN(cust_revenue) AS min_revenue
      FROM d GROUP BY decile ORDER BY decile""")
    ),

    QueryDef(
      // RFM SEGMENTATION (recency / frequency / monetary quintiles) —
      // the classic customer-base analytics cut. Three DISTRIBUTED
      // NTILEs (the q_ntile_revenue machinery: DenseIds global rank +
      // exact bucket arithmetic — a bare NTILE window is
      // single-partition at scale) over ONE per-customer aggregate
      // frame; every ordering carries o_custkey as the tiebreak so
      // both engines cut identical quintiles. recency_days is an
      // integer datediff from the corpus's own max order date (no
      // wall-clock), monetary is the Money-exact spend surfaced as a
      // double for ordering in BOTH engines.
      "q_customer_rfm",
      (s, dir) => {
        val o = Tables(s, dir).orders
        val maxd = o.agg(max(col("o_orderdate")).as("maxd"))
        val per = o.groupBy(col("o_custkey"))
          .agg(max(col("o_orderdate")).as("lastd"),
            count(lit(1)).as("frequency"),
            sum(col("o_totalprice").cast(Money)).cast("double").as("monetary"))
          .crossJoin(broadcast(maxd))
          .select(col("o_custkey"),
            datediff(col("maxd"), col("lastd")).cast("long").as("recency_days"),
            col("frequency"), col("monetary"))
        // rank FIRST (byOrder persists), count the persisted rank frame,
        // then apply THE shared NTILE bucket rule three times
        val ranked1 = DenseIds.byOrder(per, "rrk", 1L,
          col("recency_days").asc, col("o_custkey"))
        val n = ranked1.count()
        def quint(df: DataFrame, rkCol: String, out: String): DataFrame =
          ntileBucket(df, rkCol, out, n, buckets = 5L).drop(rkCol)
        val r1 = quint(ranked1, "rrk", "r_q")
        val r2 = quint(DenseIds.byOrder(r1, "frk", 1L,
          col("frequency").desc, col("o_custkey")), "frk", "f_q")
        val r3 = quint(DenseIds.byOrder(r2, "mrk", 1L,
          col("monetary").desc, col("o_custkey")), "mrk", "m_q")
        r3.select(col("o_custkey"), col("recency_days"), col("frequency"),
            col("monetary"), col("r_q"), col("f_q"), col("m_q"),
            concat(col("r_q"), col("f_q"), col("m_q")).as("segment"))
          .orderBy(col("o_custkey"))
      },
      Some("""WITH maxd AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
        per AS (SELECT o_custkey,
            CAST(datediff('day', MAX(o_orderdate), (SELECT maxd FROM maxd)) AS BIGINT) AS recency_days,
            CAST(COUNT(*) AS BIGINT) AS frequency,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
          FROM orders GROUP BY o_custkey),
        t AS (SELECT *,
            CAST(NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS BIGINT) AS r_q,
            CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_q,
            CAST(NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m_q
          FROM per)
      SELECT o_custkey, recency_days, frequency, monetary, r_q, f_q, m_q,
        CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) || CAST(m_q AS VARCHAR) AS segment
      FROM t ORDER BY o_custkey""")
    ),

    QueryDef(
      // ordered string aggregation: per-nation alphabetical roster
      // prefix. A full collect_list-then-slice materializes EVERY group
      // member in the agg buffer (a hot group = executor-memory cliff);
      // BoundedTopK keeps at most 5 names per buffer and still merges
      // map-side, with output identical to the sorted-slice form.
      "q_string_agg",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_custs"),
            BoundedTopK.firstK("c_name", 5, ",").as("first_customers"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, COUNT(*) AS n_custs,
        array_to_string(list_sort(list(c_name))[1:5], ',') AS first_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""")
    ),

    QueryDef(
      // UNPIVOT (melt): the wide per-priority counts fold back into
      // (status, bucket, n) rows via the native Dataset.unpivot — the
      // inverse of q_pivot_priority, oracle-mirrored with UNION ALL
      "q_unpivot_priority",
      (s, dir) => {
        val buckets = Seq("n1_urgent", "n2_high", "n3_medium", "n4_notspec", "n5_low")
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val wide = Tables(s, dir).orders
          .groupBy(col("o_orderstatus"))
          .agg(buckets.zip(prios).map { case (b, p) =>
            count(when(col("o_orderpriority") === p, 1)).as(b)
          }.head, buckets.zip(prios).map { case (b, p) =>
            count(when(col("o_orderpriority") === p, 1)).as(b)
          }.tail: _*)
        wide.unpivot(
            Array(col("o_orderstatus")),
            buckets.map(col).toArray,
            "priority_bucket", "n_orders")
          .orderBy(col("o_orderstatus"), col("priority_bucket"))
      },
      Some("""WITH wide AS (
        SELECT o_orderstatus,
          COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n1_urgent,
          COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n2_high,
          COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS n3_medium,
          COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS n4_notspec,
          COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n5_low
        FROM orders GROUP BY o_orderstatus)
      SELECT o_orderstatus, 'n1_urgent' AS priority_bucket, n1_urgent AS n_orders FROM wide
      UNION ALL SELECT o_orderstatus, 'n2_high', n2_high FROM wide
      UNION ALL SELECT o_orderstatus, 'n3_medium', n3_medium FROM wide
      UNION ALL SELECT o_orderstatus, 'n4_notspec', n4_notspec FROM wide
      UNION ALL SELECT o_orderstatus, 'n5_low', n5_low FROM wide
      ORDER BY o_orderstatus, priority_bucket""")
    ),

    QueryDef(
      // set operators INTERSECT / EXCEPT over customer activity periods:
      // retained vs churned customer counts across the 1996 boundary
      "q_set_ops",
      (s, dir) => {
        val o = Tables(s, dir).orders
        // persisted: each side feeds both an INTERSECT and an EXCEPT
        val early = o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .select(col("o_custkey")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val late = o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
          .select(col("o_custkey")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val both = early.intersect(late).agg(count(lit(1)).as("n_custs"))
          .select(lit("retained").as("segment"), col("n_custs"))
        val churned = early.except(late).agg(count(lit(1)).as("n_custs"))
          .select(lit("churned").as("segment"), col("n_custs"))
        val appeared = late.except(early).agg(count(lit(1)).as("n_custs"))
          .select(lit("new").as("segment"), col("n_custs"))
        both.unionByName(churned).unionByName(appeared).orderBy(col("segment"))
      },
      Some("""WITH early AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
           late AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
      SELECT 'retained' AS segment, COUNT(*) AS n_custs FROM (SELECT * FROM early INTERSECT SELECT * FROM late)
      UNION ALL
      SELECT 'churned', COUNT(*) FROM (SELECT * FROM early EXCEPT SELECT * FROM late)
      UNION ALL
      SELECT 'new', COUNT(*) FROM (SELECT * FROM late EXCEPT SELECT * FROM early)
      ORDER BY segment""")
    ),

    QueryDef(
      // sliding (hopping) windows: 1-hour windows every 30 minutes, so
      // each event lands in exactly two windows — the overlapping-window
      // shape q_events_window's tumbling variant can't express. Window
      // starts are epoch-aligned integer arithmetic on both engines.
      "q_events_sliding",
      (s, dir) => {
        Tables(s, dir).events
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(Money)).cast("double").as("total_value"))
          .select(unix_micros(col("window.start")).as("win_start_us"),
            col("event_type"), col("n_events"), col("total_value"))
          .orderBy(col("win_start_us"), col("event_type"))
      },
      Some("""WITH w AS (
        SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
          unnest([(epoch_us(ts) // 1800000000) * 1800000000,
                  (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000]) AS win_start_us
        FROM events)
      SELECT win_start_us, event_type, COUNT(*) AS n_events,
        CAST(SUM(v) AS DOUBLE) AS total_value
      FROM w GROUP BY win_start_us, event_type
      ORDER BY win_start_us, event_type""")
    ),

    QueryDef(
      // EQUI-WIDTH HISTOGRAM per event_type — the distribution-
      // monitoring primitive (drift dashboards, sanity checks before a
      // training run): 10 bins over each type's own [min, max] support.
      // Bin assignment is ONE identical IEEE double chain in both
      // engines — ((v − min) · 10) / (max − min), floored, the v = max
      // row clamped into the last bin (the q_events_anomaly
      // discipline: identical ops in identical order cannot diverge);
      // degenerate types (min = max) pin every row to bin 0 explicitly
      // instead of dividing by zero (Spark x/0.0 = ±Inf/NaN vs DuckDB
      // NULL — the exact cross-engine hole the anomaly guard closed).
      // The 10.0 literal is CAST(10 AS DOUBLE) in the oracle so DuckDB
      // cannot route the product through DECIMAL. Plan: one map-side
      // min/max aggregate (group-cardinality-sized, broadcast back
      // into the scan), then one (type, bin) aggregate — the fact
      // table streams once, both shuffles carry tiny frames.
      "q_events_histogram",
      (s, dir) => histogramBins(
        Tables(s, dir).events.select(col("event_type"), col("value"))),
      Some("""WITH mm AS (
          SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax
          FROM events GROUP BY event_type)
        SELECT e.event_type,
          CASE WHEN vmax = vmin THEN 0
               ELSE LEAST(CAST(FLOOR((value - vmin) * CAST(10 AS DOUBLE)
                 / (vmax - vmin)) AS BIGINT), 9) END AS bin,
          COUNT(*) AS n_events
        FROM events e JOIN mm USING (event_type)
        GROUP BY 1, 2 ORDER BY 1, 2""")
    ),

    QueryDef(
      // TIME-SERIES RESAMPLING with forward fill — the gap-filling
      // primitive that turns an irregular event stream into the dense
      // hourly grid feature pipelines train on. Per user: an integer
      // hour grid over the series' own support ((min div hour)+1 .. max
      // div hour — starting one hour in guarantees every grid point has
      // a preceding observation, so the fill is never null), grid
      // points unioned with the raw events, and one
      // last-non-null-value window per user carries the latest
      // observation forward. The sort key (us, is_grid) is UNIQUE per
      // user (no duplicate event timestamps ship, and is_grid breaks an
      // exact hour-boundary collision by letting the event land first),
      // so the fill is deterministic in both engines with no reliance
      // on null-ordering defaults — and `value` is carried, never
      // summed, so doubles stay exact. Plan: one keyed aggregate for
      // spans, one explode, one union, ONE shuffle on user_id for the
      // window — at 100 TB the grid is output-shaped (users × hours)
      // and every stage is user-partitioned.
      "q_events_resample",
      (s, dir) => {
        val hourUs = 3600000000L
        val ev = Tables(s, dir).events
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
        val spans = ev.groupBy(col("user_id"))
          .agg(expr("min(us) div 3600000000").as("h0"),
            expr("max(us) div 3600000000").as("h1"))
          .filter(col("h0") + 1 <= col("h1"))
        val grid = spans
          .select(col("user_id"), explode(sequence(col("h0") + 1, col("h1"))).as("h"))
          .select(col("user_id"), (col("h") * lit(hourUs)).as("us"),
            lit(null).cast("double").as("value"), lit(1).as("is_grid"))
        val pts = ev.withColumn("is_grid", lit(0)).unionByName(grid)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("is_grid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pts.withColumn("value_ff", last(col("value"), ignoreNulls = true).over(w))
          .filter(col("is_grid") === 1)
          .select(col("user_id"), col("us").as("hour_us"), col("value_ff"))
          .orderBy(col("user_id"), col("hour_us"))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
        spans AS (SELECT user_id, MIN(us) // 3600000000 AS h0, MAX(us) // 3600000000 AS h1
          FROM ev GROUP BY user_id
          HAVING MIN(us) // 3600000000 + 1 <= MAX(us) // 3600000000),
        grid AS (SELECT user_id, unnest(generate_series(h0 + 1, h1)) * 3600000000 AS us,
            CAST(NULL AS DOUBLE) AS value, 1 AS is_grid FROM spans),
        pts AS (SELECT user_id, us, value, 0 AS is_grid FROM ev
          UNION ALL SELECT user_id, us, value, is_grid FROM grid),
        f AS (SELECT user_id, us, is_grid,
            last_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, is_grid
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff
          FROM pts)
      SELECT user_id, us AS hour_us, value_ff FROM f WHERE is_grid = 1
      ORDER BY user_id, hour_us""")
    ),

    QueryDef(
      // ASSOCIATION RULES over per-user event-type baskets (market-
      // basket analysis — the recommendation/affinity primitive):
      // for every ordered type pair (ante → cons), support = users with
      // both, confidence = supp_ab/supp_a, lift = supp_ab·N/(supp_a·
      // supp_b). All counts are exact integers from two aggregates of
      // ONE distinct (user, type) frame; confidence and lift are each a
      // single IEEE division of exact integers (supp_ab·N stays far
      // inside long), so both engines compute identical doubles. The
      // basket self-join is per-user over a type vocabulary that is
      // SMALL BY DEFINITION here (event taxonomies are enum-sized); a
      // web-scale item catalog would take the co-occurrence hot-cap
      // discipline instead. Output is |types|² rows at any corpus size.
      "q_assoc_rules",
      (s, dir) => {
        val ut = Tables(s, dir).events
          .select(col("user_id"), col("event_type")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val supp = ut.groupBy(col("event_type")).agg(count(lit(1)).as("supp"))
        val nUsers = ut.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n_users"))
        val b = ut.select(col("user_id"), col("event_type").as("cons"))
        val pairs = ut.join(b, "user_id")
          .filter(col("event_type") =!= col("cons"))
          .groupBy(col("event_type").as("ante"), col("cons"))
          .agg(count(lit(1)).as("supp_ab"))
        pairs
          .join(broadcast(supp.select(col("event_type").as("ante"), col("supp").as("supp_a"))), "ante")
          .join(broadcast(supp.select(col("event_type").as("cons"), col("supp").as("supp_b"))), "cons")
          .crossJoin(broadcast(nUsers))
          .select(col("ante"), col("cons"), col("supp_ab"),
            (col("supp_ab").cast("double") / col("supp_a").cast("double")).as("confidence"),
            ((col("supp_ab") * col("n_users")).cast("double") /
              (col("supp_a") * col("supp_b")).cast("double")).as("lift"))
          .orderBy(col("ante"), col("cons"))
      },
      Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        supp AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS supp
          FROM ut GROUP BY event_type),
        n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
        pairs AS (SELECT a.event_type AS ante, b.event_type AS cons,
            CAST(COUNT(*) AS BIGINT) AS supp_ab
          FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type <> b.event_type
          GROUP BY a.event_type, b.event_type)
      SELECT p.ante, p.cons, p.supp_ab,
        CAST(p.supp_ab AS DOUBLE) / CAST(sa.supp AS DOUBLE) AS confidence,
        CAST(p.supp_ab * n.n_users AS DOUBLE) / CAST(sa.supp * sb.supp AS DOUBLE) AS lift
      FROM pairs p
      JOIN supp sa ON sa.event_type = p.ante
      JOIN supp sb ON sb.event_type = p.cons, n
      ORDER BY ante, cons""")
    ),

    QueryDef(
      // Z-SCORE ANOMALY DETECTION per event_type — the monitoring/
      // outlier-filter primitive. Float discipline: the MOMENTS are
      // decimal-exact (value cast to Money once, sum(v) and sum(v*v)
      // exact decimal aggregations — no accumulation-order drift), and
      // only then does ONE identical double chain per row compute
      // z = (v - sv/n) / sqrt((ssq - sv*sv/n)/n) in both engines —
      // deterministic IEEE ops over identical inputs, so the |z| > 3
      // threshold compare cannot diverge. DEGENERATE groups (single
      // event / constant values) are excluded up front by requiring the
      // z-chain's OWN radicand positive — (ssq - sv*sv/n)/n > 0, the
      // literal subexpression sqrt receives, so the guard and the
      // computation cannot disagree even by one rounding (an ssq*n >
      // sv*sv form was NOT equivalent: the division's independent
      // rounding can land the radicand on exactly 0). Without the
      // guard the engines genuinely diverge on degenerate groups —
      // Spark's x/0.0 is IEEE ±Inf (every row would flag) while
      // DuckDB's is NULL (every row would drop), and a cancellation-
      // negative radicand makes DuckDB's sqrt RAISE. Plan: one
      // map-side combined moment aggregate per type (5 types → a
      // one-row-per-type broadcast) joined back into the scan; no
      // second pass, no window. At 100 TB: the moment table is
      // group-cardinality-sized and the scan-side math is codegen'd
      // row-local arithmetic. Body in [[anomalyZ]].
      "q_events_anomaly",
      (s, dir) => anomalyZ(Tables(s, dir).events
        .select(col("event_id"), col("event_type"), col("value").cast(Money).as("v"))),
      Some("""WITH e AS (SELECT event_id, event_type, CAST(value AS DECIMAL(18,2)) AS v
          FROM events),
        st AS (SELECT event_type,
            CAST(SUM(v) AS DOUBLE) AS sv, CAST(SUM(v*v) AS DOUBLE) AS ssq, COUNT(*) AS n
          FROM e GROUP BY event_type
          HAVING (CAST(SUM(v*v) AS DOUBLE)
                  - CAST(SUM(v) AS DOUBLE) * CAST(SUM(v) AS DOUBLE) / COUNT(*))
                 / COUNT(*) > 0)
      SELECT e.event_id, e.event_type, CAST(e.v AS DOUBLE) AS value,
        (CAST(e.v AS DOUBLE) - sv / n) / sqrt((ssq - sv * sv / n) / n) AS z
      FROM e JOIN st ON e.event_type = st.event_type
      WHERE abs((CAST(e.v AS DOUBLE) - sv / n) / sqrt((ssq - sv * sv / n) / n)) > 3.0
      ORDER BY event_id""")
    ),

    QueryDef(
      // running cumulative aggregate: per-customer spend accumulating in
      // order date order, explicit ROWS frame so both engines agree on
      // tie handling; decimal-exact partial sums
      "q_running_total",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir).orders
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
          .withColumn("running_spend",
            sum(col("o_totalprice").cast(Money)).over(w).cast("double"))
          .withColumn("order_seq", row_number().over(
            Window.partitionBy(col("o_custkey"))
              .orderBy(col("o_orderdate"), col("o_orderkey"))).cast("long"))
          .orderBy(col("o_custkey"), col("order_seq"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        CAST(ROW_NUMBER() OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
      FROM orders WHERE o_custkey < 100
      ORDER BY o_custkey, order_seq""")
    ),

    QueryDef(
      // lead/lag order-history deltas: previous/next ticket price and
      // days since the prior order, per customer sequence. Window is
      // partitioned by customer — shuffles once on o_custkey, no global
      // sort; (o_orderdate, o_orderkey) is a total order so the shifts
      // are deterministic. o_orderdate is midnight-aligned, so Spark's
      // datediff (date cast) == DuckDB's date_diff('day', ...).
      "q_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables(s, dir).orders
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .withColumn("gap_days",
            datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast("long"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        LAG(o_totalprice) OVER w AS prev_price,
        LEAD(o_totalprice) OVER w AS next_price,
        CAST(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS gap_days
      FROM orders WHERE o_custkey < 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderdate, o_orderkey""")
    ),

    QueryDef(
      // time-RANGE frame: per event, the same user's activity over the
      // PRECEDING HOUR — count and decimal-exact spend, frame keyed on
      // event time (micros), not row position, so bursts with many rows
      // per instant are handled by peer semantics identically in both
      // engines. One shuffle on user_id; the frame sort is per-partition.
      // At 100 TB this is the plan you want: no self-join (the naive
      // range-join rewrite is events⋈events), state bounded by the
      // 1-hour frame per user.
      "q_range_window",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, 0L)
        Tables(s, dir).events
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("value"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("spend_1h", sum(col("value").cast(Money)).over(w).cast("double"))
          .select(col("event_id"), col("user_id"), col("ts_us"), col("n_1h"), col("spend_1h"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        COUNT(*) OVER w AS n_1h,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")
    ),

    QueryDef(
      // the same as-of semantics through graft's NATIVE plan node
      // (graft.plans.AsOfJoin: LogicalPlan + Strategy + sort-merge
      // SparkPlan) instead of a window rewrite. Semantics: latest view
      // with view_ts_us <= purchase ts_us per user — emitted per
      // purchase, so the correlated-MAX oracle is exactly equivalent.
      "q_asof_native",
      (s, dir) => {
        val ev = Tables(s, dir).events.withColumn("ts_us", unix_micros(col("ts")))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_us").as("view_ts_us"))
        graft.plans.AsOf.joinBackward(purchases, views, Seq("user_id"), "ts_us", "view_ts_us")
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                FROM events WHERE event_type = 'purchase'),
           v AS (SELECT user_id, epoch_us(ts) AS view_ts_us
                FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id, p.ts_us,
        (SELECT MAX(view_ts_us) FROM v
          WHERE v.user_id = p.user_id AND v.view_ts_us <= p.ts_us) AS view_ts_us
      FROM p ORDER BY p.event_id""")
    ),

    QueryDef(
      // the SAME as-of semantics once more, through the SQL SURFACE:
      // `ASOF JOIN` text -> graft's injected parser (AsOfSqlRewrite) ->
      // marker lift rule -> AsOfJoinExec. Oracle-gating this entry
      // drives the whole injectParser path through the driver's DuckDB
      // gate, not just specs.
      "q_asof_sql",
      (s, dir) => {
        val ev = Tables(s, dir).events.withColumn("ts_us", unix_micros(col("ts")))
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"))
          .createOrReplaceTempView("graft_asof_p")
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_us").as("view_ts_us"))
          .createOrReplaceTempView("graft_asof_v")
        s.sql("""SELECT p.event_id, p.user_id, p.ts_us, v.view_ts_us
          FROM graft_asof_p p ASOF JOIN graft_asof_v v
          ON p.user_id = v.user_id AND p.ts_us >= v.view_ts_us
          ORDER BY p.event_id""")
      },
      Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                FROM events WHERE event_type = 'purchase'),
           v AS (SELECT user_id, epoch_us(ts) AS view_ts_us
                FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id, p.ts_us,
        (SELECT MAX(view_ts_us) FROM v
          WHERE v.user_id = p.user_id AND v.view_ts_us <= p.ts_us) AS view_ts_us
      FROM p ORDER BY p.event_id""")
    ),

    QueryDef(
      // the native as-of join's tolerance semantics (pandas merge_asof
      // tolerance): a prior view older than 1 hour is stale and must NOT
      // match. The oracle's correlated MAX carries the same lower bound.
      "q_asof_tolerance",
      (s, dir) => {
        val tolUs = 3600L * 1000000L
        val ev = Tables(s, dir).events.withColumn("ts_us", unix_micros(col("ts")))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_us").as("view_ts_us"))
        graft.plans.AsOf.joinBackward(purchases, views, Seq("user_id"),
            "ts_us", "view_ts_us", toleranceUs = Some(tolUs))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_purchases"),
            count(col("view_ts_us")).as("n_fresh_matched"),
            sum((col("ts_us") - col("view_ts_us"))).as("total_gap_us"))
          .orderBy(col("user_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                FROM events WHERE event_type = 'purchase'),
           v AS (SELECT user_id, epoch_us(ts) AS view_ts_us
                FROM events WHERE event_type = 'view'),
           m AS (SELECT p.event_id, p.user_id, p.ts_us,
                (SELECT MAX(view_ts_us) FROM v
                  WHERE v.user_id = p.user_id AND v.view_ts_us <= p.ts_us
                    AND v.view_ts_us >= p.ts_us - 3600000000) AS view_ts_us
              FROM p)
      SELECT user_id, COUNT(*) AS n_purchases,
        COUNT(view_ts_us) AS n_fresh_matched,
        CAST(SUM(ts_us - view_ts_us) AS BIGINT) AS total_gap_us
      FROM m GROUP BY user_id ORDER BY user_id""")
    ),

    QueryDef(
      // Ordered conversion funnel (signup → view → click → purchase):
      // each stage's timestamp is the MIN event time of that type
      // strictly after the previous stage — the product-analytics
      // primitive. The declarative form is four chained correlated-MIN
      // aggregates = four shuffles of the event stream; here it is ONE
      // shuffle: co-partition by user, sort within partitions by time,
      // and walk a 4-slot state machine per user (mapPartitions is
      // justified: per-row conditional state no window/agg expresses
      // without re-shuffling). Scanning in time order and taking each
      // type's first qualifying hit IS the correlated MIN, so the
      // DuckDB mirror is exact. Per-partition memory is O(users in
      // partition) — user-dictionary-scale, not event-scale.
      "q_events_funnel",
      (s, dir) => {
        import s.implicits._
        val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
        val ev = Tables(s, dir).events
          .filter(col("event_type").isin("signup", "view", "click", "purchase"))
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        val walked = ev
          .repartition(parts, col("user_id"))
          .sortWithinPartitions(col("user_id"), col("us"))
          .as[(Long, String, Long)]
          .mapPartitions { it =>
            // THE shared transition rules (Funnel.step) — one definition
            // with the streaming funnel
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
            var cur = 0L
            var started = false
            var st = Funnel.Empty
            def flush(): Unit = if (started) out += ((cur, st.t1, st.t2, st.t3, st.t4))
            it.foreach { case (u, typ, us) =>
              if (!started || u != cur) {
                flush(); cur = u; started = true; st = Funnel.Empty
              }
              st = Funnel.step(st, typ, us)._1
            }
            flush()
            out.iterator
          }
          .toDF("user_id", "t1", "t2", "t3", "t4")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def stage(label: String, reached: Column, lat: Column) =
          walked.filter(reached)
            .agg(count(lit(1)).as("n_users"),
              coalesce(sum(lat), lit(0L)).cast("long").as("total_latency_us"))
            .select(lit(label).as("stage"), col("n_users"), col("total_latency_us"))
        stage("s1_signup", col("t1") >= 0, lit(0L))
          .unionByName(stage("s2_view", col("t2") >= 0, col("t2") - col("t1")))
          .unionByName(stage("s3_click", col("t3") >= 0, col("t3") - col("t1")))
          .unionByName(stage("s4_purchase", col("t4") >= 0, col("t4") - col("t1")))
          .orderBy(col("stage"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        u1 AS (SELECT user_id, MIN(us) AS t1 FROM e
               WHERE event_type = 'signup' GROUP BY user_id),
        u2 AS (SELECT e.user_id, u1.t1, MIN(us) AS t2 FROM e JOIN u1 USING (user_id)
               WHERE event_type = 'view' AND us > u1.t1 GROUP BY e.user_id, u1.t1),
        u3 AS (SELECT e.user_id, u2.t1, MIN(us) AS t3 FROM e JOIN u2 USING (user_id)
               WHERE event_type = 'click' AND us > u2.t2 GROUP BY e.user_id, u2.t1),
        u4 AS (SELECT e.user_id, u3.t1, MIN(us) AS t4 FROM e JOIN u3 USING (user_id)
               WHERE event_type = 'purchase' AND us > u3.t3 GROUP BY e.user_id, u3.t1)
      SELECT 's1_signup' AS stage, COUNT(*) AS n_users, CAST(0 AS BIGINT) AS total_latency_us FROM u1
      UNION ALL SELECT 's2_view', COUNT(*), CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) FROM u2
      UNION ALL SELECT 's3_click', COUNT(*), CAST(COALESCE(SUM(t3 - t1), 0) AS BIGINT) FROM u3
      UNION ALL SELECT 's4_purchase', COUNT(*), CAST(COALESCE(SUM(t4 - t1), 0) AS BIGINT) FROM u4
      ORDER BY stage""")
    ),

    QueryDef(
      // Cohort retention matrix — (signup-day cohort × day offset →
      // distinct active users), the other product-analytics staple next
      // to the funnel. Cohort assignment is a per-user MIN (one shuffle
      // on user_id, map-side combined); the user → cohort table is
      // user-dictionary-sized and joins back BROADCAST, so the event
      // stream is never reshuffled for the enrichment; the final
      // (cohort, offset) aggregate is a low-cardinality rollup.
      "q_retention_cohorts",
      (s, dir) => {
        // persisted: the cohort MIN and the distinct-activity set both
        // scan this projection
        val ev = Tables(s, dir).events
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cohorts = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val active = ev.distinct()
        // size-gated broadcast (the driver-tier discipline): the cohort
        // table is user-dictionary-cardinality, not a fixed dim — an
        // unconditional broadcast() hint would strip Spark's size-based
        // fallback and OOM on a large user population instead of
        // degrading to a shuffle join. Under the cap (~50 MB serialized)
        // the event stream is never reshuffled for the enrichment.
        val cohortsJoin =
          if (cohorts.count() <= 2000000L) broadcast(cohorts) else cohorts
        active.join(cohortsJoin, "user_id")
          .groupBy(col("cohort_day"),
            datediff(col("day"), col("cohort_day")).as("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
        active AS (SELECT DISTINCT user_id, day FROM e)
      SELECT cohort_day,
        CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
        COUNT(DISTINCT a.user_id) AS n_active
      FROM active a JOIN cohorts USING (user_id)
      GROUP BY cohort_day, day_offset
      ORDER BY cohort_day, day_offset""")
    ),

    QueryDef(
      // TPC-H Q7 shape (volume shipping): revenue flowing between two
      // nations by ship year, in both directions. The fact side joins
      // orders (fact-fact shuffle) once; supplier/customer/nation are
      // broadcast dims; the two-nation restriction is a codegen'd
      // disjunction over the joined row (it references BOTH sides, so
      // it cannot push below the join — the dims' own IN-filters can
      // and do).
      "q7_volume_shipping",
      (s, dir) => {
        val t = Tables(s, dir)
        val n1 = t.nation.filter(col("n_name").isin("NATION_3", "NATION_7"))
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = t.nation.filter(col("n_name").isin("NATION_3", "NATION_7"))
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
        $revenueSql AS revenue, COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_3', 'NATION_7')
        AND n2.n_name IN ('NATION_3', 'NATION_7')
        AND n1.n_name <> n2.n_name
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year""")
    ),

    QueryDef(
      // TPC-H Q10 shape (returned-item reporting): customers ranked by
      // revenue lost to returns in one quarter's orders. One fact-fact
      // shuffle (orders pre-filtered to the quarter), customer + nation
      // broadcast, top 20 via TakeOrderedAndProject — never a global
      // sort.
      "q10_returned_items",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem.filter(col("l_returnflag") === "R")
          .join(t.orders.filter(
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
          .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name, c_acctbal,
        $revenueSql AS revenue, COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY c_custkey, c_name, n_name, c_acctbal
      ORDER BY revenue DESC, c_custkey LIMIT 20""")
    ),

    QueryDef(
      // TPC-H Q13 shape (customer distribution): orders-per-customer
      // histogram through a LEFT OUTER join — customers with zero
      // orders MUST survive to the c_count=0 bucket, which is exactly
      // what an inner join silently drops. Two-level aggregation: the
      // inner one shuffles on custkey (AQE handles the hot-customer
      // skew this query is famous for), the outer one reduces a
      // histogram-sized set.
      "q13_customer_distribution",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer
          .join(t.orders, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, COUNT(*) AS custdist
      FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey) c_orders
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")
    ),

    QueryDef(
      // TPC-H Q14 shape: promotion revenue share for one ship quarter.
      // lineitem never shuffles — part is a broadcast dim — and the
      // shipdate range reaches the parquet scan as a pushed filter, so
      // at 100 TB this reads one quarter's row groups, joins map-side,
      // and reduces to two decimal sums. The share is a final
      // double-by-double division of exact decimal sums (identical
      // operands in both engines → identical bits).
      "q14_promo_share",
      (s, dir) => {
        val t = Tables(s, dir)
        val zero4 = lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 4))
        t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", discPrice).otherwise(zero4))
              .cast("double").as("promo_revenue"),
            revenue.as("total_revenue"))
          .select(col("promo_revenue"), col("total_revenue"),
            (lit(100.0) * col("promo_revenue") / col("total_revenue")).as("promo_pct"))
      },
      Some(s"""SELECT promo_revenue, total_revenue,
        100.0 * promo_revenue / total_revenue AS promo_pct
      FROM (SELECT
        CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $discPriceSql
          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
        $revenueSql AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00') q""")
    ),

    QueryDef(
      // TPC-H Q18 shape (large-volume orders): group-by-HAVING on the
      // fact table, then join the surviving keys back to orders +
      // broadcast customer. The aggregate runs FIRST — the heavy side
      // collapses to qualifying order keys before any join, so the
      // orders join probes a tiny filtered build side instead of the
      // full fact-fact shuffle.
      "q18_large_orders",
      (s, dir) => {
        val t = Tables(s, dir)
        val big = t.lineitem.groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 300.0)
        big.join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some(s"""WITH big AS (
        SELECT l_orderkey, ${sqlSum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING ${sqlSum("l_quantity")} > 300.0)
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      FROM big JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")
    ),

    QueryDef(
      // TPC-H Q19 shape: revenue under a disjunction of per-brand
      // (size, quantity) windows. Catalyst can't split an OR across the
      // join, but the join itself is a broadcast dim probe and the whole
      // disjunction evaluates inside one whole-stage-codegen'd filter on
      // the joined row — the fact side is scanned once, never shuffled.
      // Grouped by brand so the gate checks each disjunct's row set, not
      // just one blended total.
      "q19_disjunctive",
      (s, dir) => {
        val t = Tables(s, dir)
        val cond =
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 40))
        t.lineitem
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .filter(cond)
          .groupBy(col("p_brand"))
          .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("p_brand"))
      },
      Some(s"""SELECT p_brand, $revenueSql AS revenue, COUNT(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
      GROUP BY p_brand ORDER BY p_brand""")
    ),

    QueryDef(
      // TPC-H Q8 shape (national market share): ratio of two conditional
      // decimal-exact aggregates over the full dimensional join
      // (part/customer/region restrict; supplier nation feeds the CASE
      // numerator). Every dimension broadcasts, so the fact side
      // shuffles once for the orders join and once for the final
      // one-row-per-year aggregate — at 100 TB lineitem never moves for
      // a dimension. mkt_share divides the two already-exact doubles,
      // bit-identical in both engines.
      "q8_market_share",
      (s, dir) => {
        val t = Tables(s, dir)
        val zero4 = lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 4))
        val amer = t.nation
          .join(t.region.filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("c_nk"))
        val suppNat = t.nation
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        // restrict customer to the region BEFORE broadcasting: the hash
        // table ships ~1/5 of the customers and the fact path pays one
        // probe instead of two
        val amerCust = t.customer
          .join(amer, col("c_nationkey") === col("c_nk"))
          .select(col("c_custkey"))
        t.lineitem
          .join(broadcast(t.part.filter(col("p_type") === "STANDARD")),
            col("l_partkey") === col("p_partkey"))
          .join(t.orders
              .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(amerCust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(suppNat), col("s_nationkey") === col("s_nk"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_7", discPrice).otherwise(zero4))
              .cast("double").as("nation_volume"),
            revenue.as("total_volume"))
          .select(col("o_year"), col("nation_volume"), col("total_volume"),
            (col("nation_volume") / col("total_volume")).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some(s"""SELECT o_year, nation_volume, total_volume,
        nation_volume / total_volume AS mkt_share
      FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
        CAST(SUM(CASE WHEN n2.n_name = 'NATION_7' THEN $discPriceSql
          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_volume,
        $revenueSql AS total_volume
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_year) q ORDER BY o_year""")
    ),

    QueryDef(
      // TPC-H Q22 shape (global sales opportunity): customers with an
      // above-average balance and no RECENT orders, grouped by an
      // identifier prefix. Adapted twice for the testdata: the schema
      // has no c_phone, so the group key is the last two digits of
      // c_name (SUBSTRING is 1-based with identical semantics in both
      // engines), and the synthetic order generator gives nearly every
      // customer SOME order, so the NOT EXISTS is scoped to orders
      // since 2000 (dormant customers) — same machinery, non-degenerate
      // output at every SF. The global threshold is a decimal-exact
      // scalar broadcast to every row; the only shuffle is the
      // customer-vs-recent-orders ANTI join on custkey plus the tiny
      // final group — at 100 TB orders is the big side, the date filter
      // prunes it at the scan, and the anti join shuffles it once on
      // its join key.
      "q22_sales_opportunity",
      (s, dir) => {
        val t = Tables(s, dir)
        val avgBal = t.customer.filter(col("c_acctbal") > 0)
          .agg(davg(col("c_acctbal")).as("avg_bal"))
        t.customer
          .join(t.orders
              .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "leftanti")
          .crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .groupBy(substring(col("c_name"), 17, 2).as("cust_group"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
          .orderBy(col("cust_group"))
      },
      Some(s"""SELECT SUBSTRING(c_name, 17, 2) AS cust_group, COUNT(*) AS n_cust,
        ${sqlSum("c_acctbal")} AS total_bal
      FROM customer c
      WHERE c_acctbal > (
          SELECT ${sqlAvg("c_acctbal")}
          FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY cust_group ORDER BY cust_group""")
    ),

    QueryDef(
      // TPC-H Q15 shape (top supplier): revenue per supplier over one
      // quarter, keep the supplier(s) hitting the global maximum. The
      // scalar max is an aggregate OF the per-supplier aggregate — a
      // one-row broadcast joined back to the (supplier-cardinality)
      // revenue table, so the fact table is scanned once per branch and
      // never shuffled against the scalar. Both engines derive total_rev
      // from the same decimal-exact sum, so the double equality against
      // the max is bit-deterministic, not a float hazard.
      "q15_top_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        val rev = t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(revenue.as("total_rev"))
        val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
        rev.crossJoin(broadcast(maxRev))
          .filter(col("total_rev") === col("max_rev"))
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev"))
          .orderBy(col("s_suppkey"))
      },
      Some(s"""WITH rev AS (
        SELECT l_suppkey, $revenueSql AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_rev
      FROM rev JOIN supplier ON s_suppkey = l_suppkey
      WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
      ORDER BY s_suppkey""")
    ),

    QueryDef(
      // TPC-H Q17 shape (small-quantity-order revenue): lines whose
      // quantity is below 20% of their part's average, summed per brand.
      // The correlated per-part average becomes a lineitem self-
      // aggregation joined back on partkey — the canonical Q17 plan: two
      // fact shuffles, both on l_partkey (Catalyst co-partitions the agg
      // output with the probe side), dimension broadcast for the brand.
      // The average is decimal-exact sum / count so the 0.2x threshold
      // is the same double in both engines; grouping by brand (vs the
      // benchmark's single scalar) makes the hash check 25 rows wide.
      "q17_small_qty_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        val thr = t.lineitem
          .groupBy(col("l_partkey").as("t_pk"))
          .agg((lit(0.2) * davg(col("l_quantity"))).as("qty_thr"))
        t.lineitem
          .join(thr, col("l_partkey") === col("t_pk"))
          .filter(col("l_quantity") < col("qty_thr"))
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_small"),
            (dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
          .orderBy(col("p_brand"))
      },
      Some(s"""SELECT p_brand, COUNT(*) AS n_small,
        ${sqlSum("l_extendedprice")} / 7.0 AS avg_yearly
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN (SELECT l_partkey AS t_pk,
              0.2 * (${sqlAvg("l_quantity")}) AS qty_thr
            FROM lineitem GROUP BY l_partkey) a ON l_partkey = t_pk
      WHERE l_quantity < qty_thr
      GROUP BY p_brand ORDER BY p_brand""")
    ),

    QueryDef(
      // TPC-H Q21 shape (suppliers who kept orders waiting): for finished
      // orders with more than one supplier, find the SOLE supplier who
      // shipped late, and count waiting orders per supplier. Adapted to
      // the testdata schema: no l_commitdate/l_receiptdate, so "late" is
      // shipped >180 days after the order date. The textbook EXISTS +
      // NOT-EXISTS double self-join of lineitem (the oracle runs that
      // form) is re-expressed as ONE keyed aggregation: per order,
      // countDistinct(all suppliers) / countDistinct(late suppliers) /
      // max(late supplier) — when exactly one supplier is late, max IS
      // that supplier. One fact shuffle on orderkey instead of three;
      // numwait counts distinct waiting orders (the dedup the row-level
      // EXISTS form needs anyway).
      "q21_waiting_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        val lateSk = when(
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 180 DAYS"),
          col("l_suppkey"))
        t.lineitem
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(t.orders.filter(col("o_orderstatus") === "F")
              .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("late_sk", lateSk)
          .groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("late_sk")).as("n_late"),
            max(col("late_sk")).as("sole_late_sk"))
          .filter(col("n_supp") > 1 && col("n_late") === 1)
          .join(broadcast(t.supplier), col("sole_late_sk") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      },
      Some("""SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait FROM (
        SELECT DISTINCT s_name, l1.l_orderkey
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 180 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 180 DAY)) w
      GROUP BY s_name ORDER BY numwait DESC, s_name""")
    ),

    QueryDef(
      // TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
      // the supplier(s) in one region achieving the minimum supply cost,
      // via a correlated-min subquery. The schema has no partsupp table,
      // so the part-supplier catalog is DERIVED from shipment history:
      // cost(part, supp) = MIN(l_extendedprice) over their lineitems — a
      // fact aggregation on the composite key (one shuffle), after which
      // everything is dimension-sized: qualifying parts and the
      // region-restricted supplier roster broadcast, and the per-part
      // minimum (part-cardinality) broadcasts back for the equality
      // probe. Cost stays DECIMAL(18,2) end-to-end, so the min-equality
      // join is exact in both engines — never a double comparison.
      "q2_min_cost_supplier",
      (s, dir) => {
        val t = Tables(s, dir)
        val ps = t.lineitem
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("l_extendedprice").cast(Money)).as("cost_dec"))
        val parts = t.part
          .filter(col("p_size") <= 10 && col("p_type") === "STANDARD")
          .select(col("p_partkey"))
        val euro = t.supplier
          .join(broadcast(t.nation
              .join(t.region.filter(col("r_name") === "EUROPE"),
                col("n_regionkey") === col("r_regionkey"))
              .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
        val offers = ps
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(euro), col("l_suppkey") === col("s_suppkey"))
        // correlated min as a per-part window over the ALREADY-aggregated
        // offers (part x region-supplier cardinality) — one lineitem
        // scan total, vs the self-join form's second scan + re-aggregate;
        // decimal equality keeps ties exactly like the oracle's = MIN()
        offers
          .withColumn("min_cost",
            min(col("cost_dec")).over(Window.partitionBy(col("p_partkey"))))
          .filter(col("cost_dec") === col("min_cost"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("cost_dec").cast("double").as("cost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      },
      Some("""WITH ps AS (
        SELECT l_partkey, l_suppkey,
          MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost_dec
        FROM lineitem GROUP BY l_partkey, l_suppkey)
      SELECT s_acctbal, s_name, n_name, p_partkey,
        CAST(ps.cost_dec AS DOUBLE) AS cost
      FROM part
      JOIN ps ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_size <= 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
        AND ps.cost_dec = (
          SELECT MIN(ps2.cost_dec) FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""")
    ),

    QueryDef(
      // TPC-H Q9 shape (product-type profit by nation and year): profit
      // per supplier nation per order year over a name-matched part
      // subset. No ps_supplycost in the schema, so line cost is modeled
      // as half the part's retail price per unit: profit =
      // disc_price - 0.5 * l_quantity * p_retailprice. Both terms are
      // exact decimal sums surfaced as doubles, combined with one
      // halving (exact in binary) and one subtraction — bit-identical
      // cross-engine, no decimal-literal scale hazards. Plan: part
      // filter broadcasts into the lineitem scan, supplier/nation
      // broadcast, one fact shuffle for the orders join, one for the
      // 25-nation x 7-year aggregate.
      "q9_product_profit",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .join(broadcast(t.part.filter(col("p_name").like("%widget%"))
              .select(col("p_partkey"), col("p_retailprice"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg((sum(discPrice).cast("double") -
            dsumProd(col("l_quantity"), col("p_retailprice")) / lit(2.0))
            .as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""SELECT n_name AS nation,
        CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
        CAST(SUM($discPriceSql) AS DOUBLE) -
          ${sqlSumProd("l_quantity", "p_retailprice")} / 2.0 AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%widget%'
      GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
      ORDER BY nation, o_year DESC""")
    ),

    QueryDef(
      // TPC-H Q11 shape (important stock): per-part value of the
      // shipments sourced from one region's suppliers, keeping parts
      // above a fixed fraction of the total — the group-by with a
      // global-scalar HAVING. The scalar is an aggregate OF the
      // per-part aggregate (exact decimal sum both levels), broadcast
      // back as a one-row frame. Like q15/q17, the fact side is scanned
      // and pre-aggregated once per branch: DataFrame self-reference
      // re-aliases attribute ids, so exchange reuse cannot dedupe the
      // two branches (measured: 0 ReusedExchange) — the at-scale answer
      // is staging the per-part aggregate, not a plan trick. Both
      // engines compare the same two doubles derived from the same
      // exact decimals, so the > cut is bit-deterministic.
      "q11_important_stock",
      (s, dir) => {
        val t = Tables(s, dir)
        val asia = t.supplier
          .join(broadcast(t.nation
              .join(t.region.filter(col("r_name") === "ASIA"),
                col("n_regionkey") === col("r_regionkey"))
              .select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val perPart = t.lineitem
          .join(broadcast(asia), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_extendedprice").cast(Money)).as("val_dec"))
        val total = perPart.agg(sum(col("val_dec")).cast("double").as("total_value"))
        perPart
          .crossJoin(broadcast(total))
          .filter(col("val_dec").cast("double") > col("total_value") * lit(0.001))
          .select(col("l_partkey"), col("val_dec").cast("double").as("stock_value"))
          .orderBy(col("stock_value").desc, col("l_partkey"))
      },
      Some("""WITH pv AS (
        SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val_dec
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY l_partkey)
      SELECT l_partkey, CAST(val_dec AS DOUBLE) AS stock_value
      FROM pv
      WHERE CAST(val_dec AS DOUBLE) >
        (SELECT CAST(SUM(val_dec) AS DOUBLE) FROM pv) * 0.001
      ORDER BY stock_value DESC, l_partkey""")
    ),

    QueryDef(
      // TPC-H Q12 shape (shipping-mode priority split): per category,
      // how many late-shipped lines belong to critical-priority orders
      // vs the rest. No l_shipmode/l_commitdate in the schema: the
      // category is l_returnflag and "late" is shipped >60 days after
      // the order date within one year. One fact-fact join on orderkey
      // (both sides date-pruned at the scan), then a 3-row conditional
      // aggregate — the CASE runs inside the first (partial) agg, so
      // the shuffle carries 3 keys x 2 longs.
      "q12_priority_latency",
      (s, dir) => {
        val t = Tables(s, dir)
        val crit = col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH"
        t.lineitem
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_shipdate"), col("l_returnflag"))
          .join(t.orders.select(col("o_orderkey"), col("o_orderdate"),
              col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(crit, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),

    QueryDef(
      // TPC-H Q16 shape (supplier count by part attribute, with an
      // excluded-supplier subquery): distinct suppliers per (brand,
      // type, size) over the shipment-derived part-supplier catalog,
      // excluding a problem-supplier set (negative account balance
      // stands in for the benchmark's complaint-comment scan — same
      // NOT IN machinery, a column the schema actually has). The
      // catalog distinct and the count-distinct both shuffle on
      // composite keys; the exclusion set is supplier-sized and anti-
      // joins broadcast; part attributes broadcast onto the catalog.
      "q16_supplier_cnt",
      (s, dir) => {
        val t = Tables(s, dir)
        val catalog = t.lineitem
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val excluded = t.supplier
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        catalog
          .join(broadcast(excluded),
            col("l_suppkey") === col("s_suppkey"), "leftanti")
          .join(broadcast(t.part
              .filter(col("p_type") =!= "PROMO" &&
                col("p_size").isin(1, 10, 20, 30, 40, 50))
              .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
        CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON p_partkey = l_partkey
      WHERE p_type <> 'PROMO' AND p_size IN (1, 10, 20, 30, 40, 50)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    ),

    QueryDef(
      // TPC-H Q20 shape (suppliers with excess stock of a named part
      // family): suppliers in one region whose shipped quantity of
      // 'red %' parts in 1996 ran far above typical — the nested
      // part-subquery -> per-(supplier, part) aggregate -> threshold ->
      // semi-join-to-supplier pipeline. No ps_availqty: the threshold
      // is 2x the global mean per-pair quantity (an aggregate OF the
      // aggregate, one-row broadcast), mirroring Q20's 0.5*sum(qty)
      // correlation. Quantities aggregate as exact decimals; the
      // threshold compare is double-vs-double from identical exact
      // operands. The red-part filter broadcasts into the date-pruned
      // fact scan, once per branch (threshold + probe — the q15/q17
      // per-branch-scan shape; self-reference re-aliasing defeats
      // exchange reuse); the final roster is supplier-sized.
      "q20_top_suppliers",
      (s, dir) => {
        val t = Tables(s, dir)
        val red = t.part.filter(col("p_name").like("red%")).select(col("p_partkey"))
        val pairQty = t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .join(broadcast(red), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum(col("l_quantity").cast(Money)).as("qty_dec"))
        val thr = pairQty.agg(
          (sum(col("qty_dec")).cast("double") / count(lit(1)).cast("double"))
            .as("mean_qty"))
        val heavy = pairQty
          .crossJoin(broadcast(thr))
          .filter(col("qty_dec").cast("double") > col("mean_qty") * lit(2.0))
          .select(col("l_suppkey")).distinct()
        t.supplier
          .join(broadcast(t.nation
              .join(t.region.filter(col("r_name") === "EUROPE"),
                col("n_regionkey") === col("r_regionkey"))
              .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(heavy), col("s_suppkey") === col("l_suppkey"), "leftsemi")
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH pq AS (
        SELECT l_suppkey, l_partkey,
          SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey)
      SELECT s_suppkey, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND s_suppkey IN (
        SELECT l_suppkey FROM pq
        WHERE CAST(qty_dec AS DOUBLE) >
          (SELECT CAST(SUM(qty_dec) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           FROM pq) * 2.0)
      ORDER BY s_suppkey""")
    )
  )

  /** THE distributed-NTILE bucket rule — shared by `q_ntile_revenue`
    * and `q_customer_rfm` (the anomaly-guard lesson: duplicated
    * arithmetic drifts). Assigns the 1-based dense rank `rkCol` (from
    * [[DenseIds.byOrder]]) into `buckets` NTILE-exact buckets over `n`
    * rows: the first n % buckets buckets take one extra row, exactly
    * SQL NTILE's rule. */
  private def ntileBucket(df: DataFrame, rkCol: String, out: String,
                          n: Long, buckets: Long): DataFrame = {
    val q = n / buckets
    val rem = n % buckets
    df.withColumn(out,
      when(col(rkCol) <= rem * (q + 1),
        expr(s"($rkCol - 1) DIV ${q + 1} + 1"))
        .otherwise(expr(s"$rem + ($rkCol - 1 - ${rem * (q + 1)}) DIV ${math.max(q, 1L)} + 1"))
        .cast("long"))
  }

  /** q_events_histogram body on an explicit (event_type, value) frame —
    * factored so the spec can drive the degenerate (min = max) guard
    * and the bin-edge clamp with engineered groups (the anomalyZ
    * pattern). */
  private[operators] def histogramBins(ev: DataFrame): DataFrame = {
    val mm = ev.groupBy(col("event_type"))
      .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    ev.join(broadcast(mm), "event_type")
      .select(col("event_type"),
        when(col("vmax") === col("vmin"), lit(0L)).otherwise(
          least(floor((col("value") - col("vmin")) * lit(10.0) /
            (col("vmax") - col("vmin"))), lit(9L))).as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("event_type"), col("bin"))
  }

  /** `q_events_anomaly` body over a (event_id, event_type, v: Money)
    * frame — parameterized so specs can feed degenerate groups.
    * Semantics and the degenerate-group guard are documented at the
    * QueryDef. */
  private[operators] def anomalyZ(e: DataFrame): DataFrame = {
    val st = e.groupBy(col("event_type")).agg(
        sum(col("v")).cast("double").as("sv"),
        sum(col("v") * col("v")).cast("double").as("ssq"),
        count(lit(1)).as("n"))
      // guard on the z-chain's OWN radicand (rationale at the QueryDef)
      .filter((col("ssq") - col("sv") * col("sv") / col("n")) / col("n") > 0)
    e.join(broadcast(st), "event_type")
      .withColumn("value", col("v").cast("double"))
      .withColumn("z", (col("value") - col("sv") / col("n")) /
        sqrt((col("ssq") - col("sv") * col("sv") / col("n")) / col("n")))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy(col("event_id"))
  }
}
