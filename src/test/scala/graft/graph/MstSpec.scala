package graft.graph

import graft.{SparkEntry, SparkFixture}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Pins `spo_mst`: both tiers return the UNIQUE forest under the
  * (w, a, b) total edge order, agreeing edge-for-edge with an
  * independent PRIM reference (a third algorithm family — agreement
  * pins the forest, not the iteration); plus the structural identity
  * and the loud Borůvka round-bound refusal. */
class MstSpec extends AnyFunSuite with SparkFixture {

  private def w(a: Long, b: Long): Long = 1L + (a + b) % 7L

  /** Independent reference: Prim from each unvisited node, always
    * growing by the (w, a, b)-smallest frontier edge. With a total
    * order the MSF is unique, so Prim must equal Kruskal/Borůvka. */
  private def referencePrim(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> (a, b), b -> (a, b)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val visited = scala.collection.mutable.HashSet.empty[Long]
    val out = scala.collection.mutable.HashSet.empty[(Long, Long, Long)]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!visited.contains(start)) {
        visited += start
        val frontier = scala.collection.mutable.TreeSet.empty[(Long, Long, Long)]
        def expand(v: Long): Unit =
          adj(v).foreach { case (a, b) => frontier += ((w(a, b), a, b)) }
        expand(start)
        while (frontier.nonEmpty) {
          val e @ (ew, a, b) = frontier.head
          frontier -= e
          val nxt = if (!visited.contains(a)) Some(a)
            else if (!visited.contains(b)) Some(b) else None
          nxt.foreach { v =>
            out += ((a, b, ew)); visited += v; expand(v)
          }
        }
      }
    }
    out.toSet
  }

  private def runMst(edges: Seq[(Long, Long)], driverCap: Long = 2000000L,
                     roundCap: Int = GraphQueries.MstMaxRounds): Set[(Long, Long, Long)] = {
    import spark.implicits._
    GraphQueries.mst(edges.toDF("a", "b"), driverCap, roundCap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("both tiers equal the independent Prim reference on the shipped graph") {
    val g = TripleStore.staged(spark, "/root/testdata/sf0.001")
    val edges = g.half.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = referencePrim(edges)
    val driver = SparkEntry.queries("spo_mst")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(driver == want, s"driver tier: ${driver.size} vs ${want.size} edges")
    assert(runMst(edges, driverCap = 0L) == want, "distributed tier diverged")
    // structural identity: |forest| = |V| - |components|
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val comps = {
      val uf = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long = { var r = x; while (uf(r) != r) r = uf(r); r }
      edges.foreach { case (a, b) => uf(find(a)) = find(b) }
      nodes.map(find).distinct.size
    }
    assert(want.size == nodes.size - comps)
    // every forest edge is a real edge carrying the derived weight
    val es = edges.toSet
    want.foreach { case (a, b, ew) =>
      assert(es.contains(a -> b) && ew == w(a, b))
    }
  }

  test("weight ties resolve through the total order: both tiers still unique on an all-equal-weight cycle") {
    // square 2-4-16-18-2: every edge's (a+b) % 7 is 6, so all four
    // weigh 7 — the choice of which cycle edge to DROP rides purely on
    // the (w, a, b) total order
    val edges = Seq((2L, 4L), (4L, 16L), (16L, 18L), (2L, 18L))
    val want = referencePrim(edges)
    assert(runMst(edges) == want)
    assert(runMst(edges, driverCap = 0L) == want)
    assert(want.size == 3, "a 4-cycle's spanning tree has 3 edges")
  }

  test("the distributed round bound refuses loudly instead of returning a partial forest") {
    // a path of 9 nodes needs ~log2(8) = 3 Borůvka rounds; cap at 1
    val edges = (0L until 8L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      runMst(edges, driverCap = 0L, roundCap = 1)
    }
    assert(e.getMessage.contains("fixpoint"))
    // and at the real bound it finishes: a path's MSF is the path itself
    assert(runMst(edges, driverCap = 0L) ==
      edges.map { case (a, b) => (a, b, w(a, b)) }.toSet)
  }

  test("empty graph yields an empty forest, not a crash") {
    assert(runMst(Nil).isEmpty)
  }
}
