package graft.similarity

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Pins `cluster_kmeans` against an independent in-process Lloyd's
  * reference (the BpeSpec discipline for iterative fixpoints no SQL
  * engine expresses): same init rule (k lowest vec_id vectors), same
  * nearest rule (strict <, first index wins), same empty-cell rule
  * (keep previous centroid). Cluster SIZES must match exactly —
  * assignment flips need a vector near-equidistant to two centroids at
  * float-sum-order resolution, which the synthetic corpus does not
  * contain; INERTIA is compared at 1e-9 relative (the distributed
  * trainer sums partials in (cell, partition) order, the reference in
  * row order — same values, different low-bit accumulation order).
  */
class KmeansSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private val K = 8
  private val Iters = 4

  private def reference(): (Array[Array[Double]], Array[Double], Array[Long]) = {
    val rows = graft.operators.Tables(spark, dir).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val vecs = rows.map(_._2)
    var cents = rows.take(K).map(_._2.map(_.toDouble))
    val inertias = new Array[Double](Iters)
    var sizes = new Array[Long](K)
    def nearest(cs: Array[Array[Double]], v: Array[Float]): (Int, Double) = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        val n = math.min(cs(c).length, v.length)
        while (i < n) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      (best, bestD)
    }
    for (t <- 0 until Iters) {
      val sums = Array.fill(K)(new Array[Double](vecs.head.length))
      val counts = new Array[Long](K)
      vecs.foreach { v =>
        val (c, d) = nearest(cents, v)
        inertias(t) += d
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(K)(c =>
        if (counts(c) > 0) sums(c).map(_ / counts(c)) else cents(c))
      sizes = counts
    }
    // final sizes under the FINAL centroids (what the query reports)
    val finalCounts = new Array[Long](K)
    val finalInertia = new Array[Double](K)
    vecs.foreach { v =>
      val (c, d) = nearest(cents, v)
      finalCounts(c) += 1
      finalInertia(c) += d
    }
    (cents, finalInertia, finalCounts)
  }

  test("cluster_kmeans matches the independent reference and its own gates hold") {
    val (_, refInertia, refSizes) = reference()
    val got = SparkEntry.queries("cluster_kmeans")(spark, dir).collect()
    assert(got.length == K)
    val total = refSizes.sum
    got.foreach { r =>
      val c = r.getInt(r.fieldIndex("cluster"))
      assert(r.getAs[Long]("n_vecs") == refSizes(c), s"cluster $c size drifted")
      assert(r.getAs[Long]("nearest_violations") == 0L, s"cluster $c: non-nearest member")
      assert(r.getAs[Long]("inertia_monotone") == 1L, "Lloyd's objective not monotone")
      assert(r.getAs[Long]("n_iters") == Iters.toLong)
      val share = r.getAs[Double]("share")
      assert(math.abs(share - refSizes(c).toDouble / total) < 1e-12)
      val inertia = r.getAs[Double]("inertia")
      val rel = math.abs(inertia - refInertia(c)) / math.max(1e-12, refInertia(c))
      assert(rel < 1e-6, s"cluster $c inertia $inertia vs reference ${refInertia(c)}")
    }
    assert(got.map(_.getAs[Long]("n_vecs")).sum == total)
  }
}
