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
