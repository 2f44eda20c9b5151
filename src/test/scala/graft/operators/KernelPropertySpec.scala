package graft.operators

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the shared kernels that multiple operators
  * lean on — the pure JVM cores the distributed plans delegate to, plus
  * the DenseIds assignment primitive (the one Spark-side property every
  * oracle id-match rests on). Each property compares the kernel against
  * an INDEPENDENT reference implementation over deterministic
  * scalacheck samples (raw generators + seeds, like
  * FramingPropertySpec — the scalatest bridge isn't on the offline
  * classpath).
  */
class KernelPropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def sample[A](g: Gen[A], seed: Long, fallback: A): A =
    g.apply(params, Seed(seed)).getOrElse(fallback)

  // strings biased toward interesting comparator territory: ASCII,
  // high-BMP (>= U+E000), and supplementary-plane (surrogate pairs)
  private val strGen: Gen[String] = Gen.listOfN(6, Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.choose(0xE000.toChar, 0xFFFD.toChar).map(_.toString),
    2 -> Gen.choose(0x10000, 0x10FFF).map(cp => new String(Character.toChars(cp)))
  )).map(_.mkString)

  test("BoundedTopK reduce/merge over any split == sorted-by-UTF8-bytes take(k)") {
    // independent reference order: encode to UTF-8 and compare unsigned
    // bytes — utf8Cmp's allocation-free fixup must agree exactly
    val byteOrd: Ordering[String] = (a: String, b: String) => {
      val ba = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
      val n = math.min(ba.length, bb.length)
      var i = 0
      var r = 0
      while (i < n && r == 0) { r = (ba(i) & 0xff) - (bb(i) & 0xff); i += 1 }
      if (r != 0) r else ba.length - bb.length
    }
    for (trial <- 0 until 200) {
      val k = 1 + (trial % 7)
      val agg = new BoundedTopK(k, "|")
      val xs = sample(Gen.listOfN(1 + trial % 25, strGen), 900L + trial, Nil)
      val expect = xs.sorted(byteOrd).take(k).mkString("|")
      // any split into partitions + any merge order must agree
      val cut = sample(Gen.choose(0, xs.length), 5000L + trial, 0)
      val (p1, p2) = xs.splitAt(cut)
      val b1 = p1.foldLeft(agg.zero)(agg.reduce)
      val b2 = p2.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(b1, b2)) == expect, s"trial $trial xs=$xs")
      assert(agg.finish(agg.merge(b2, b1)) == expect, s"trial $trial (swapped)")
    }
  }

  test("Funnel.step fold in time order == chained correlated MINs") {
    val types = Seq("signup", "view", "click", "purchase", "other")
    for (trial <- 0 until 300) {
      val n = 1 + trial % 20
      val evs = (0 until n).map { i =>
        val ty = sample(Gen.oneOf(types), trial * 100L + i, "other")
        // distinct strictly-increasing timestamps: the walker's input
        // order (time order) is unambiguous
        (ty, 10L * (i + 1))
      }
      val folded = evs.foldLeft(Funnel.Empty) { case (st, (ty, us)) =>
        Funnel.step(st, ty, us)._1
      }
      // reference: four chained correlated MINs over the event multiset
      def minAfter(ty: String, after: Long): Long =
        evs.collect { case (t, us) if t == ty && us > after => us }
          .minOption.getOrElse(-1L)
      val t1 = evs.collect { case ("signup", us) => us }.minOption.getOrElse(-1L)
      val t2 = if (t1 < 0) -1L else minAfter("view", t1)
      val t3 = if (t2 < 0) -1L else minAfter("click", t2)
      val t4 = if (t3 < 0) -1L else minAfter("purchase", t3)
      assert(folded == Funnel.State(t1, t2, t3, t4), s"trial $trial evs=$evs")
    }
  }

  test("DenseIds.byOrder == row_number() regardless of input partitioning") {
    // the primitive every oracle id-match rests on: ids must equal the
    // window-function rank for ANY physical layout of the input
    val spark = graft.SparkFixture.session
    import spark.implicits._
    for (trial <- 0 until 5) {
      val n = 50 + trial * 37
      val names = sample(Gen.listOfN(n, strGen), 7000L + trial, Nil).distinct
      for (parts <- Seq(1, 3, 32)) {
        val df = names.toDF("name").repartition(parts)
        val got = graft.operators.DenseIds
          .byOrder(df, "id", 1L, org.apache.spark.sql.functions.col("name"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        // reference: Spark's own sort order (UTF8String binary), ranked
        val expect = df.sort("name").collect().map(_.getString(0))
          .zipWithIndex.map { case (s, i) => (s, i + 1L) }.toMap
        assert(got == expect, s"trial $trial parts=$parts")
      }
    }
  }

  test("UnionFind components == brute-force reachability, any edge order") {
    for (trial <- 0 until 200) {
      val n = 2 + trial % 30
      val m = trial % 40
      val edges = (0 until m).map { e =>
        (sample(Gen.choose(0, n - 1), trial * 1000L + e, 0),
          sample(Gen.choose(0, n - 1), trial * 1000L + 500 + e, 0))
      }
      val uf = new graft.graph.UnionFind(n)
      edges.foreach { case (a, b) => uf.union(a, b) }
      val kernelComp = (0 until n).map(uf.find)
      // reference: BFS over the undirected adjacency, label = min id
      val adj = Array.fill(n)(List.empty[Int])
      edges.foreach { case (a, b) =>
        adj(a) = b :: adj(a); adj(b) = a :: adj(b)
      }
      val ref = Array.fill(n)(-1)
      for (s <- 0 until n if ref(s) < 0) {
        var frontier = List(s); ref(s) = s
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(u => adj(u).filter(v => ref(v) < 0))
            .distinct
          frontier.foreach(v => ref(v) = s)
        }
      }
      // same partition: two nodes share a kernel root iff they share a
      // reference label; and min-rooted union means root == min id
      for (a <- 0 until n; b <- 0 until n)
        assert((kernelComp(a) == kernelComp(b)) == (ref(a) == ref(b)),
          s"trial $trial: partition mismatch at ($a,$b)")
      assert(kernelComp.zipWithIndex.forall { case (root, i) => ref(i) == root },
        s"trial $trial: roots are not the component minima")
    }
  }
}
