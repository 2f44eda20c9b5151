package graft.similarity

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Pins `embed_pca` (the Kmeans/BpeSpec discipline for iterative
  * recurrences no SQL engine expresses): planted-axis recovery on
  * engineered corpora, the trace/orthonormality invariants the query
  * surfaces as gates, agreement of the top eigenvalues with an
  * INDEPENDENT power-iteration + deflation reference (a different
  * algorithm family from the cyclic Jacobi), and rerun byte-identity.
  */
class PcaSpec extends AnyFunSuite with SparkFixture {

  private def toDf(vecs: Seq[Array[Float]]) = {
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  /** Independent top-k eigenpairs: power iteration with deflation on
    * the same covariance matrix (fixed deterministic start vector). */
  private def powerRef(cov: Array[Array[Double]], k: Int): Seq[Double] = {
    val d = cov.length
    val a = cov.map(_.clone())
    (0 until k).map { _ =>
      var v = Array.tabulate(d)(i => 1.0 / math.sqrt(d + i + 1.0))
      var lam = 0.0
      for (_ <- 0 until 500) {
        val w = new Array[Double](d)
        for (i <- 0 until d; j <- 0 until d) w(i) += a(i)(j) * v(j)
        val n = math.sqrt(w.map(x => x * x).sum)
        if (n > 1e-300) { v = w.map(_ / n); lam = n } else lam = 0.0
      }
      // deflate: a -= lam v vᵀ
      for (i <- 0 until d; j <- 0 until d) a(i)(j) -= lam * v(i) * v(j)
      lam
    }
  }

  test("planted anisotropic axes are recovered with exact shares") {
    // 4-dim corpus: axis 0 swings ±3, axis 1 swings ±1, axes 2-3 dead.
    // Eigenvalues must be (9, 1, 0, 0); eigenvectors the unit axes.
    val vecs = Seq(
      Array(3f, 0f, 0f, 0f), Array(-3f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f), Array(0f, -1f, 0f, 0f))
    val (n, mean, cov) = Similarity.covarianceStats(spark, toDf(vecs))
    assert(n == 4 && mean.forall(_ == 0.0))
    val (evals, v) = Similarity.jacobiEigen(cov)
    val sorted = evals.sorted(Ordering[Double].reverse)
    assert(math.abs(sorted(0) - 4.5) < 1e-12) // (9+9)/4
    assert(math.abs(sorted(1) - 0.5) < 1e-12) // (1+1)/4
    assert(math.abs(sorted(2)) < 1e-12 && math.abs(sorted(3)) < 1e-12)
    // the top component is axis 0 with positive sign (sign convention)
    val top = evals.indices.maxBy(evals(_))
    assert(math.abs(v(0)(top) - 1.0) < 1e-12)
  }

  test("rotated plane: off-axis principal directions, trace preserved") {
    // points along (1,1,0,0)/√2 (variance 4) and (1,-1,0,0)/√2
    // (variance 1) — covariance is NOT diagonal, Jacobi must rotate
    val s2 = math.sqrt(2.0).toFloat
    val vecs = Seq(
      Array(2f / s2, 2f / s2, 0f, 0f), Array(-2f / s2, -2f / s2, 0f, 0f),
      Array(1f / s2, -1f / s2, 0f, 0f), Array(-1f / s2, 1f / s2, 0f, 0f))
    val (_, _, cov) = Similarity.covarianceStats(spark, toDf(vecs))
    assert(math.abs(cov(0)(1)) > 0.1, "engineered covariance must be non-diagonal")
    val (evals, v) = Similarity.jacobiEigen(cov)
    val order = evals.indices.sortBy(i => -evals(i))
    assert(math.abs(evals(order(0)) - 2.0) < 1e-6) // 2·4/4 (f32 inputs)
    assert(math.abs(evals(order(1)) - 0.5) < 1e-6) // 2·1/4 (f32 inputs)
    val trace = cov.indices.map(i => cov(i)(i)).sum
    assert(math.abs(evals.sum - trace) < 1e-12, "trace not preserved")
    // top eigenvector ∝ (1,1,0,0)/√2, sign convention positive
    val t = order(0)
    assert(math.abs(v(0)(t) - 1.0 / math.sqrt(2)) < 1e-6)
    assert(math.abs(v(1)(t) - 1.0 / math.sqrt(2)) < 1e-6)
  }

  test("shipped corpus: gates hold, power-iteration reference agrees, rerun byte-identical") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("embed_pca")(spark, dir).collect()
    assert(out.length == Similarity.PcaComponents)
    val traceGap = out.head.getDouble(4)
    val ortho = out.head.getDouble(5)
    val evs = out.map(_.getDouble(1))
    // gates: the query's own driver-visible invariants
    assert(ortho < 1e-9, s"orthonormality residual $ortho")
    assert(evs.sorted(Ordering[Double].reverse).sameElements(evs), "eigenvalues not sorted")
    assert(evs.forall(_ >= 0.0), "negative variance")
    val cum = out.map(_.getDouble(3))
    assert(cum.sorted.sameElements(cum) && cum.last <= 1.0 + 1e-9)
    // trace_gap relative to total variance
    val vecs = graft.operators.Tables(spark, dir).embeddings
      .select("vec_id", "embedding")
    val (_, _, cov) = Similarity.covarianceStats(spark, vecs)
    val trace = cov.indices.map(i => cov(i)(i)).sum
    assert(traceGap < 1e-9 * math.max(trace, 1.0), s"trace gap $traceGap")
    // independent algorithm family: top-3 eigenvalues from power
    // iteration with deflation (6dp output rounding allowed for)
    val ref = powerRef(cov, 3)
    (0 until 3).foreach { i =>
      assert(math.abs(evs(i) - ref(i)) < 1e-5 * math.max(ref(i), 1.0),
        s"component ${i + 1}: ${evs(i)} vs ${ref(i)}")
    }
    // rerun determinism, byte-for-byte
    val again = SparkEntry.queries("embed_pca")(spark, dir).collect()
    assert(again.toSeq == out.toSeq)
  }
}
