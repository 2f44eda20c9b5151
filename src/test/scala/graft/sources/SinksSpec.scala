package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle on either side") {
    val t = graft.operators.Tables(spark, dir)
    Sinks.bucketed(t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", Seq("o_orderkey"), 4)
    Sinks.bucketed(t.lineitem.select("l_orderkey", "l_quantity"),
      "lineitem_b", Seq("l_orderkey"), 4)
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // the whole point of bucketing: co-located join, no exchange before it
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"orders side shuffled:\n${plan.take(1200)}")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"lineitem side shuffled:\n${plan.take(1200)}")
      // sanity: result matches the plain-parquet join
      val expected = t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey")).agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("sorted buckets feed sort-merge joins without a per-task sort") {
    val t = graft.operators.Tables(spark, dir)
    Sinks.sortedBuckets(t.orders.select("o_orderkey", "o_totalprice"),
      "orders_sb", Seq("o_orderkey"), 4)
    Sinks.sortedBuckets(t.lineitem.select("l_orderkey", "l_quantity"),
      "lineitem_sb", Seq("l_orderkey"), 4)
    try {
      // force SMJ (disable broadcast) to observe the sort elimination;
      // since Spark 3.0 the scan only exposes bucket sort order behind
      // the legacy flag (and only with one file per bucket — true here:
      // single input partition per write)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        val joined = spark.table("orders_sb")
          .join(spark.table("lineitem_sb"), col("o_orderkey") === col("l_orderkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(800))
        assert(!plan.contains("Exchange hashpartitioning"), "bucketed SMJ still shuffled")
        assert(!plan.contains("Sort ["), s"bucketed SMJ re-sorted:\n${plan.take(1200)}")
        assert(joined.count() > 0)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_sb")
      spark.sql("DROP TABLE IF EXISTS lineitem_sb")
    }
  }
}
