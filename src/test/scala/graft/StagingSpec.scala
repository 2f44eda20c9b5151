package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards the session-staging tier (TripleStore.staged,
  * Dedup.stagedDocFeatures, AngularBlocking via its staged callers):
  * one build per (session, dataset), no cross-dataset collisions, and
  * the staged artifacts are EXACTLY the per-query construction they
  * replaced — the oracle gate proves end results, this spec pins the
  * cache keying and the artifact equivalence directly so a staging bug
  * can't hide behind a query that happens not to exercise it.
  */
class StagingSpec extends AnyFunSuite with SparkFixture {

  private val dirA = "/root/testdata/sf0.001"
  private val dirB = "/root/testdata/sf0.01"

  test("staged graph artifacts: one build per (session, dir), distinct across dirs") {
    val g1 = graft.graph.TripleStore.staged(spark, dirA)
    val g2 = graft.graph.TripleStore.staged(spark, dirA)
    assert(g1 eq g2, "same session+dir must return the cached instance")
    val gB = graft.graph.TripleStore.staged(spark, dirB)
    assert(!(g1 eq gB), "different dirs must not share a cache entry")
    assert(g1.dict.count() != gB.dict.count(),
      "cross-dir collision: both dirs yielded the same dictionary")
  }

  test("staged graph artifacts equal fresh per-query construction") {
    val T = graft.graph.TripleStore
    val g = T.staged(spark, dirA)
    val t = T.triplesFromEvents(graft.operators.Tables(spark, dirA).events)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(g.objects) == rows(T.objects(t)))
    assert(rows(g.dict) == rows(T.idDictionary(t)
      .select(col("object_id"), col("name"))))
    assert(rows(g.half) == rows(T.halfEdges(t, T.idDictionary(t))))
    assert(rows(g.relationships) == rows(T.relationships(t, T.objects(t))))
    assert(rows(g.so) == rows(t.select(col("subject"), col("object")).distinct()))
  }

  test("SessionStaged builds once, tears down on clear, rebuilds after") {
    var builds = 0
    var tornDown = List.empty[String]
    val cache = new graft.operators.SessionStaged[String]((_, dir) => {
      builds += 1; s"artifact-$dir"
    }, a => tornDown ::= a)
    assert(cache.get(spark, "x") == "artifact-x")
    assert(cache.get(spark, "x") == "artifact-x")
    assert(builds == 1, "second get must hit the cache")
    cache.get(spark, "y")
    assert(builds == 2)
    cache.clear()
    assert(tornDown.toSet == Set("artifact-x", "artifact-y"),
      "clear must run teardown on every entry")
    assert(cache.get(spark, "x") == "artifact-x" && builds == 3,
      "cleared entries rebuild on next access")
  }

  test("staged dedup features equal the per-query kernel outputs") {
    val D = graft.dedup.Dedup
    val docs = graft.operators.Tables(spark, dirA).documents
    val staged = D.stagedDocFeatures(spark, dirA)
    assert(staged eq D.stagedDocFeatures(spark, dirA))
    // the combined sig+sim pass must agree with each single-flag pass
    val sigOnly = D.shingleFeatures(docs, withSig = true, withSim = false)
      .collect().map(r => (r.getLong(0), (r.getSeq[String](1), r.getSeq[Long](2)))).toMap
    val simOnly = D.shingleFeatures(docs, withSig = false, withSim = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val both = staged.feats
      .collect().map(r => (r.getLong(0),
        (r.getSeq[String](1), r.getSeq[Long](2), r.getLong(3)))).toMap
    assert(both.keySet == sigOnly.keySet)
    assert(both.forall { case (id, (ss, bands, sim)) =>
      sigOnly(id) == ((ss, bands)) && simOnly(id) == sim })
    val wsFresh = D.wordSets(docs)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val wsStaged = staged.ws
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(wsStaged == wsFresh)
  }
}
