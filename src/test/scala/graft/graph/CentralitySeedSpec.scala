package graft.graph

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Pins the centrality seed rule (VERDICT r11 item 2): a FIXED-count
  * deterministic set — the SeedCount smallest ids with
  * id % SeedMod == 0 — in BOTH formulations (driver-tier Seq filter and
  * distributed-tier frame), and the SQL mirror semantics the closeness
  * oracle uses (`WHERE id % 17 = 0 ORDER BY id LIMIT 128`). The point
  * of the cap: the joint forward BFS frame is |S|·|V| rows; a
  * fraction-of-nodes rule made that quadratic in |V| on connected
  * graphs, the fixed count keeps it linear.
  */
class CentralitySeedSpec extends AnyFunSuite with SparkFixture {

  test("seed rule: both formulations agree, capped at SeedCount smallest") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 4000 scattered ids → 236 multiples of 17: the cap must bite
    val idSeq = (1L to 4000L).filter(v => v % 3 != 0) :+ 0L
    val viaSeq = GraphQueries.seedIdsOf(idSeq)
    val viaFrame = GraphQueries.seedFrameOf(idSeq.toDF("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaSeq == viaFrame, "driver and frame seed formulations diverge")
    assert(viaSeq.size == Betweenness.SeedCount, s"cap did not bite: ${viaSeq.size}")
    // the SQL-mirror semantics: smallest matching ids, in order
    val sqlRule = idSeq.filter(_ % 17 == 0).sorted.take(128)
    assert(viaSeq == sqlRule)
    // fewer candidates than the cap → all of them (the shipped graphs)
    val small = Seq(0L, 17L, 34L, 5L, 9L)
    assert(GraphQueries.seedIdsOf(small) == Seq(0L, 17L, 34L))
    // negative ids: floor-mod keeps the rule total
    assert(GraphQueries.seedIdsOf(Seq(-17L, -1L, 17L)) == Seq(-17L, 17L))
    assert(GraphQueries.seedFrameOf(Seq(-17L, -1L, 17L).toDF("id"))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(-17L, 17L))
    // the frame plan ships only K rows (TakeOrdered), independent of |V|
    val plan = GraphQueries.seedFrameOf(idSeq.toDF("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"seed frame should be a TakeOrdered, got:\n$plan")
    // and no shuffle anywhere: TakeOrdered takes per-partition heaps to
    // the driver — a plan that Exchanges a fraction of |V| first is
    // exactly the quadratic-shipping regression this spec pins away
    assert(!plan.contains("Exchange"),
      s"seed frame plan shuffles:\n$plan")
    locally { val _ = col("id") } // keep the import load-bearing
  }

  test("seed frame bounds the joint BFS frame linearly, not quadratically") {
    // |S| stays SeedCount as |V| grows 10× — the linear-frame argument
    import spark.implicits._
    val small = GraphQueries.seedFrameOf((1L to 3000L).toDF("id")).count()
    val large = GraphQueries.seedFrameOf((1L to 30000L).toDF("id")).count()
    assert(small == Betweenness.SeedCount && large == Betweenness.SeedCount,
      s"seed count grew with |V|: $small -> $large")
  }
}
