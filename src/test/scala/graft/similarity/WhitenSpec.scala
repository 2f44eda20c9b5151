package graft.similarity

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** embed_whiten: the applied PCA-whitening transform. Pins identity
  * covariance of the OUTPUT on an engineered anisotropic + correlated
  * corpus (checked independently in-spec, not just via the query's own
  * gate columns), planted-correlation removal, the gate columns
  * themselves, and rerun byte-identity. */
class WhitenSpec extends AnyFunSuite with SparkFixture {

  /** Deterministic anisotropic corpus: axis 0 carries 10× scale, axis 1
    * is strongly correlated with it, axes 2-3 are independent smaller
    * signals. No RNG — integer residue patterns, so reruns are exact. */
  private def corpus = {
    import spark.implicits._
    (0 until 200).map { i =>
      val a = ((i * 37) % 101 - 50) / 10.0
      val b = ((i * 53) % 89 - 44) / 10.0
      val c = ((i * 71) % 97 - 48) / 10.0
      (i.toLong, Array((10.0 * a).toFloat, (3.0 * a + b).toFloat,
        c.toFloat, ((i % 7) - 3).toFloat / 10.0f))
    }.toDF("vec_id", "embedding")
  }

  test("whitened output has identity covariance (independent in-spec check) and gates agree") {
    val out = Similarity.whiten(spark, corpus).collect()
    assert(out.length == 200)
    val w = out.map(r => r.getSeq[Double](r.fieldIndex("whitened")).toArray)
    val dims = w.head.length
    assert(out.forall(_.getAs[Long]("n_components") == dims.toLong))
    // independent covariance of the collected output
    val n = w.length.toDouble
    val mean = Array.tabulate(dims)(j => w.map(_(j)).sum / n)
    def cov(i: Int, j: Int): Double =
      w.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    for (i <- 0 until dims) {
      assert(math.abs(mean(i)) < 1e-9, s"mean($i) = ${mean(i)}")
      assert(math.abs(cov(i, i) - 1.0) < 1e-6, s"var($i) = ${cov(i, i)}")
      for (j <- i + 1 until dims)
        assert(math.abs(cov(i, j)) < 1e-6,
          s"planted correlation survived: cov($i,$j) = ${cov(i, j)}")
    }
    // the query's own gate columns tell the same story
    val r0 = out.head
    assert(r0.getAs[Double]("whiten_offdiag") < 1e-6)
    assert(r0.getAs[Double]("whiten_diag_err") < 1e-6)
    assert(r0.getAs[Double]("whiten_mean_resid") < 1e-9)
  }

  test("rerun is byte-identical") {
    // sorted in-spec: whiten() no longer carries a presentation-only
    // global sort (r15), so collect order is not part of the contract
    def run() = Similarity.whiten(spark, corpus).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Double](r.fieldIndex("whitened")).map(java.lang.Double.doubleToLongBits).toSeq)).toSeq
      .sortBy(_._1)
    assert(run() == run())
  }

  test("rank-deficient corpus: the scalar boundary NULLs missing components instead of throwing") {
    // ADVICE r14: under ANSI (this repo's default, never disabled) a
    // plain element_at past the array end THROWS — a corpus whose
    // whitening keeps < 4 components would crash the driver gate. The
    // boundary uses try_element_at; this pins the fix on a 4-dim corpus
    // of rank 2 (dims 2/3 are exact copies of dims 0/1 → dropped).
    import spark.implicits._
    val rankDeficient = (0 until 100).map { i =>
      val a = ((i * 37) % 101 - 50) / 10.0
      val b = ((i * 53) % 89 - 44) / 10.0
      (i.toLong, Array(a.toFloat, b.toFloat, a.toFloat, b.toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.whitenScalars(Similarity.whiten(spark, rankDeficient)).collect()
    assert(out.length == 100)
    val r0 = out.head
    assert(r0.getAs[Long]("n_components") == 2L)
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("w0")) &&
      !r.isNullAt(r.fieldIndex("w1"))))
    assert(out.forall(r => r.isNullAt(r.fieldIndex("w2")) &&
      r.isNullAt(r.fieldIndex("w3"))),
      "components past n_components must surface as NULL, not throw")
  }

  test("shipped corpus: every direction whitened, gates near zero") {
    val e = graft.operators.Tables(spark, "/root/testdata/sf0.001").embeddings
      .select(col("vec_id"), col("embedding"))
    val out = Similarity.whiten(spark, e)
    val r0 = out.head()
    assert(out.count() == e.count())
    assert(r0.getAs[Double]("whiten_offdiag") < 1e-6)
    assert(r0.getAs[Double]("whiten_diag_err") < 1e-6)
  }
}
