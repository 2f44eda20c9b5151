package graft.dedup

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `dedup_semantic_whitened` — embed_whiten's consumer. Pins the
  * SemDeDup motivation as a DEMONSTRATION, not an assertion: on an
  * isotropic corpus raw-space and whitened-space clustering return
  * identical verdicts, and on an anisotropic corpus (one dominant
  * shared direction) RAW clustering provably collapses every planted
  * cluster into one component while the whitened space recovers the
  * planted partition exactly. Also pins the single-eigensolve staging
  * contract (reference identity + checkpoint-scan plan) and rerun
  * determinism. */
class WhitenedDedupSpec extends AnyFunSuite with SparkFixture {

  private val Dim = 16
  private val PerAxis = 4

  /** Deterministic axis corpus: 60 vectors on axes 1..15 of R^16 (4
    * per axis — same-axis vectors are exact duplicates, cross-axis
    * raw cosine is exactly 0), plus `shift`·e0 shared by EVERY vector.
    * shift = 0 → isotropic-across-used-axes; shift = 10 → the dominant
    * direction inflates every raw pairwise cosine to ~0.99. Expected
    * semantic partition: the 15 axis groups. */
  private def corpus(shift: Double): DataFrame = {
    import spark.implicits._
    (0 until 15 * PerAxis).map { i =>
      val axis = 1 + (i % 15)
      val v = Array.fill(Dim)(0.0f)
      v(0) = shift.toFloat
      v(axis) = 1.0f
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def expectedPartition: Set[Set[Long]] =
    (0 until 15).map(a =>
      (0 until PerAxis).map(r => (r * 15 + a).toLong).toSet).toSet

  private def clustersOf(pairs: DataFrame): Set[Set[Long]] =
    Dedup.semanticClusterFrame(spark, pairs.select(col("vec_a"), col("vec_b")))
      .collect()
      .groupBy(_.getAs[Long]("cluster_id"))
      .values.map(_.map(_.getAs[Long]("vec_id")).toSet).toSet

  private def rawClusters(vecs: DataFrame, tau: Double): Set[Set[Long]] =
    clustersOf(AngularBlocking.cosinePairs(spark, vecs, tau))

  private def whitenedClusters(vecs: DataFrame, tau: Double): Set[Set[Long]] = {
    // the query body's transform chain over an engineered corpus
    val w = graft.similarity.Similarity.whiten(spark, vecs)
    val cast = w.select(col("vec_id"),
      transform(col("whitened"), x => x.cast("float")).as("embedding"))
    clustersOf(AngularBlocking.cosinePairs(spark, cast, tau))
  }

  test("isotropic corpus: whitened and raw clustering return identical verdicts") {
    val vecs = corpus(shift = 0.0)
    val raw = rawClusters(vecs, 0.4)
    val white = whitenedClusters(vecs, 0.4)
    assert(raw == expectedPartition, "raw clustering lost the planted partition")
    assert(white == raw, "whitening changed verdicts on an isotropic corpus")
  }

  test("anisotropic corpus: raw clustering collapses, whitened recovers the planted partition") {
    val vecs = corpus(shift = 10.0)
    // the dominant shared direction glues everything into ONE cluster
    val raw = rawClusters(vecs, 0.4)
    assert(raw == Set((0L until 60L).toSet),
      s"expected the raw collapse the operator exists to fix, got ${raw.size} clusters")
    // whitening drops the zero-variance shared direction and equalizes
    // the rest: the planted 15-cluster partition comes back exactly
    val white = whitenedClusters(vecs, 0.4)
    assert(white == expectedPartition,
      s"whitened clustering did not recover the planted partition: $white")
  }

  test("one eigensolve per (session, dataset): staged frame is shared and lineage-cut") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.similarity.Similarity.stagedWhitenFrame(spark, dir)
    val b = graft.similarity.Similarity.stagedWhitenFrame(spark, dir)
    assert(a eq b, "staged whiten frame rebuilt — a second eigensolve would run")
    // the frame is localCheckpoint'd: consumers scan materialized
    // blocks (an RDD scan leaf), they cannot re-run the covariance pass
    val leaves = a.queryExecution.executedPlan.collectLeaves().map(_.nodeName)
    assert(leaves.exists(_.contains("Scan ExistingRDD")),
      s"staged whiten frame is not lineage-cut: $leaves")
  }

  test("the query runs on the shipped corpus: rows, gates, determinism") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.SparkEntry.queries("dedup_semantic_whitened")(spark, dir)
      .collect().map(_.toString).toSeq.sorted
    val out = run()
    assert(out.nonEmpty, "whitened semantic dedup found no clusters on the shipped corpus")
    assert(run() == out, "rerun differed")
  }
}
