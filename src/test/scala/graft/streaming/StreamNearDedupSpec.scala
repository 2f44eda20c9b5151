package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming ingest near-dup loop: every micro-batch is deduped
  * against base corpus + all earlier batches (never against itself),
  * and re-delivery of the last batch — the only replay the engine's
  * serialized micro-batches can produce — is idempotent even though
  * the crash may land between the output write and the index append. */
class StreamNearDedupSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.operators.Tables(spark, dir).documents

  /** Driver-side brute force over shingle SETS — an independent
    * implementation of the same jaccard (|∩|/|∪| over distinct
    * 3-shingles, integer-derived doubles, bit-identical to the
    * engine's sorted-merge kernel). */
  private def bruteSets(): Map[Long, Set[String]] =
    graft.dedup.Dedup.shingleSets(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap

  private def jac(a: Set[String], b: Set[String]): Double = {
    val i = (a & b).size
    i.toDouble / (a.size + b.size - i)
  }

  test("each batch dedups against base + earlier batches; last-batch replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tau = 0.5
    val base = docs.filter(col("doc_id") % 7 =!= 0)
    val b1 = docs.filter(col("doc_id") % 14 === 0)
    val b2 = docs.filter(col("doc_id") % 7 === 0 && col("doc_id") % 14 =!= 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_snd").toString
    val idx = s"$tmp/idx"
    val out = s"$tmp/out"
    try {
      graft.dedup.BandIndex.build(spark, base, idx)
      val input = MemoryStream[(Long, String, String, String, Long)]
      val stream = input.toDF()
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val q = stream.writeStream
        .foreachBatch(StreamNearDedup.sink(idx, out, tau = tau))
        .start()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "text", "lang", "source", "n_chars").as[
          (Long, String, String, String, Long)].collect().toSeq
      try {
        input.addData(rows(b1))
        q.processAllAvailable()
        input.addData(rows(b2))
        q.processAllAvailable()
      } finally q.stop()

      val got = StreamNearDedup.pairs(spark, out)
        .collect()
        .map(r => (r.getAs[Long]("delta_id"), r.getAs[Long]("base_id"),
          r.getAs[Double]("jaccard"))).toSet

      // expected: for each streamed doc, pairs against base + strictly
      // earlier batches (same-batch pairs are out of contract)
      val sets = bruteSets()
      val baseIds = base.select("doc_id").collect().map(_.getLong(0)).toSet
      val b1Ids = b1.select("doc_id").collect().map(_.getLong(0)).toSet
      val b2Ids = b2.select("doc_id").collect().map(_.getLong(0)).toSet
      def expectedFor(deltaIds: Set[Long], history: Set[Long]) =
        for {
          d <- deltaIds; e <- history
          if sets.contains(d) && sets.contains(e)
          j = jac(sets(d), sets(e)) if j >= tau
        } yield (d, e, j)
      val expected = expectedFor(b1Ids, baseIds) ++
        expectedFor(b2Ids, baseIds ++ b1Ids)
      assert(expected.nonEmpty, "degenerate fixture: no cross-batch near-dups")
      assert(got == expected)

      // at-least-once: re-deliver the LAST batch with its own id — the
      // batch is already folded into the index, the self-exclusion must
      // discard it and rewrite identical output
      StreamNearDedup.sink(idx, out, tau = tau)(b2, 1L)
      val replayed = StreamNearDedup.pairs(spark, out)
        .collect()
        .map(r => (r.getAs[Long]("delta_id"), r.getAs[Long]("base_id"),
          r.getAs[Double]("jaccard"))).toSet
      assert(replayed == expected)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
