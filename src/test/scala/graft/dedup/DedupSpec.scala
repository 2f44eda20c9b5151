package graft.dedup

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("shingle kernel matches the declarative HOF formulation exactly") {
    val docs = graft.operators.Tables(spark, dir).documents.limit(200)
    // the HOF pipeline is the executable SPECIFICATION of the kernel's
    // semantics (array_distinct over sequential 3-shingles of
    // split(lower(text), ' ')); the kernel must reproduce it verbatim —
    // same docs dropped, same shingles, same first-occurrence order
    val viaHof = Dedup.shingleSets(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaKernel = Dedup.shingleFeatures(docs, withSig = false, withSim = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaKernel.nonEmpty)
    assert(viaKernel == viaHof)
  }

  test("angular blocking is exactly the brute-force pair join at every tau") {
    val e = graft.operators.Tables(spark, dir).embeddings
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    // taus spanning loose (dense output, weak pruning) to tight (sparse
    // output, strong pruning): recall 1 must hold at all of them, not
    // just the graded 0.3 — the triangle-inequality bound is
    // threshold-independent
    for (tau <- Seq(0.1, 0.3, 0.45)) {
      val brute = a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("cosine", graft.similarity.VectorOps.cosineNative(col("ea"), col("eb")))
        .filter(col("cosine") >= tau)
        .select(col("vec_a"), col("vec_b"), col("cosine"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val blocked = AngularBlocking.cosinePairs(spark, e, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(blocked == brute, s"tau=$tau: blocked=${blocked.size} brute=${brute.size}")
      assert(brute.nonEmpty || tau > 0.4, s"tau=$tau oracle vacuous")
    }
  }

  test("word sets normalize consistently with the oracle formulation") {
    val ws = Dedup.wordSets(graft.operators.Tables(spark, dir).documents.limit(20))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(ws.nonEmpty)
    ws.foreach { case (_, set) =>
      assert(set.distinct.length == set.length, "word set has duplicates")
      assert(set.forall(w => w == w.toLowerCase), "word set not lowercased")
    }
  }
}
