package graft.graph

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class TrianglesSpec extends AnyFunSuite with SparkFixture {

  /** edges as unordered pairs; canonicalized to (a < b) here */
  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long]) = {
    import spark.implicits._
    val half = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
    Triangles.countPerNode(half, nodes.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a single triangle counts once per corner") {
    val counts = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)), Seq(1L, 2L, 3L, 4L))
    assert(counts == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("K4: every node sits in C(3,2) = 3 triangles") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = for { a <- nodes; b <- nodes if a < b } yield (a, b)
    val counts = run(edges, nodes)
    assert(counts == nodes.map(_ -> 3L).toMap)
  }

  test("paths and stars are triangle-free") {
    // path 1-2-3-4 plus a 5-armed star at 10: wedges everywhere, no closure
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)) ++
      (11L to 15L).map(i => (10L, i))
    val nodes = Seq(1L, 2L, 3L, 4L, 10L) ++ (11L to 15L)
    assert(run(edges, nodes).values.forall(_ == 0L))
  }

  test("two triangles sharing an edge: shared endpoints count 2, apexes 1") {
    // triangles (1,2,3) and (1,2,4) share edge (1,2)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    val counts = run(edges, Seq(1L, 2L, 3L, 4L))
    assert(counts == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("empty edge set: every node zero") {
    val counts = run(Seq.empty, Seq(7L, 8L))
    assert(counts == Map(7L -> 0L, 8L -> 0L))
  }

  test("random graphs match brute force (seeded, 5 trials)") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(18) // 8..25 nodes
      val nodes = (0L until n).toSeq
      val edges = (for {
        a <- nodes; b <- nodes if a < b
        if rnd.nextDouble() < 0.3
      } yield (a, b))
      val counts = run(edges, nodes)
      val es = edges.map { case (a, b) => Set(a, b) }.toSet
      val brute = nodes.map { v =>
        v -> (for {
          a <- nodes; b <- nodes if a < b
          if a != v && b != v
          if es(Set(a, v)) && es(Set(b, v)) && es(Set(a, b))
        } yield 1).size.toLong
      }.toMap
      assert(counts == brute, s"trial $trial: n=$n edges=${edges.size}")
    }
  }

  test("counts are orientation-invariant: hub-heavy graph matches brute force") {
    // hub 0 connected to 1..12, ring 1-2-...-12-1: triangles are exactly
    // (0, i, i+1) around the ring — 12 of them; brute-force check
    val ring = (1L to 12L).map(i => (i, if (i == 12L) 1L else i + 1))
    val spokes = (1L to 12L).map(i => (0L, i))
    val nodes = 0L to 12L
    val counts = run(ring ++ spokes, nodes)
    // brute force over all node triples
    val es = (ring ++ spokes).map { case (a, b) => Set(a, b) }.toSet
    val brute = nodes.map { n =>
      n -> (for {
        a <- nodes; b <- nodes if a < b
        if Set(a, b, n).size == 3
        if es(Set(a, n)) && es(Set(b, n)) && es(Set(a, b))
      } yield 1).size.toLong
    }.toMap
    assert(counts == brute)
    assert(counts(0L) == 12L)
  }

  test("clustering coefficient: clique 1.0, star 0.0, bowtie center between") {
    import spark.implicits._
    def coeff(edges: Seq[(Long, Long)], nodes: Seq[Long]) = {
      val half = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toDF("a", "b")
      GraphQueries.clusterCoeffFrom(half, nodes.toDF("id"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    }
    // K4: every neighborhood is a complete triangle set -> C = 1
    val k4 = coeff(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)), Seq(1L,2L,3L,4L))
    k4.values.foreach { case (d, t, c) => assert(d == 3L && t == 3L && c == 1.0) }
    // star: center has degree 3, no triangles -> 0; leaves degree 1 -> 0 by the d<2 guard
    val star = coeff(Seq((1L,2L),(1L,3L),(1L,4L)), Seq(1L,2L,3L,4L))
    assert(star(1L) == ((3L, 0L, 0.0)))
    assert(star(2L) == ((1L, 0L, 0.0)))
    // bowtie (two triangles joined at node 3): center sees 2 of its
    // C(4,2)=6 neighbor pairs closed -> 2*2/(4*3) = 1/3
    val bow = coeff(Seq((1L,2L),(1L,3L),(2L,3L),(3L,4L),(3L,5L),(4L,5L)), Seq(1L,2L,3L,4L,5L))
    assert(bow(3L) == ((4L, 2L, 2.0 * 2.0 / 12.0)))
    assert(bow(1L) == ((2L, 1L, 1.0)))
    // isolated node: degree 0, C = 0
    val iso = coeff(Seq((1L,2L)), Seq(1L,2L,9L))
    assert(iso(9L) == ((0L, 0L, 0.0)))
  }
}
