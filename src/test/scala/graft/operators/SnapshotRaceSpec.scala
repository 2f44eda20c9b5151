package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** An ACTUAL race over the snapshot discipline (the earlier spec only
  * simulated the losing half): a publisher thread drives the real
  * ingest cadence — append, publish, protected compact — while reader
  * threads resolve and integrity-check continuously, with no
  * synchronization between them beyond the filesystem. Every resolve a
  * reader ever observes must be (a) a COMPLETE manifest (the in-flight
  * footer rule holding under fire), (b) intact per verify() — no
  * pinned file missing mid-race, since compaction protects every live
  * version — and (c) IMMUTABLE: the observed file census for a version
  * must equal a post-race resolveAt of the same version, byte for
  * byte. One pinned probe per observed version then pins that the
  * census differences are real (each version sees exactly its
  * publish-time corpus). */
class SnapshotRaceSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private val Terms = Seq("spark", "merge", "vector")

  test("publisher appending/publishing/compacting vs concurrent resolving " +
    "readers: every observed cut is complete, intact, and immutable") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_snaprace").toString
    val term = s"$tmp/term"
    val snap = s"$tmp/snap"
    try {
      graft.textfn.TermIndex.build(spark,
        Tables(spark, dir).documents
          .select(col("doc_id"), col("text")).filter(col("doc_id") % 3 =!= 0),
        term)

      val rounds = 8
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val observed = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Map[String, Seq[String]])]

      val readers = (1 to 2).map { _ =>
        new Thread(() => {
          while (!done.get()) {
            try {
              val s = ServingSnapshot.resolve(snap)
              val missing = ServingSnapshot.verify(s)
              if (missing.nonEmpty)
                failures.add(s"v${s.version}: missing pinned files $missing")
              observed.add((s.version, s.legs.map { case (n, l) => n -> l.files }))
            } catch {
              case e: IllegalArgumentException
                  if e.getMessage.contains("no complete snapshot") => () // pre-first-publish
              case t: Throwable => failures.add(s"reader: $t")
            }
          }
        })
      }
      readers.foreach(_.start())

      // the publisher IS the test's clock: real appends (new postings
      // files land inside the live generation), a publish per round,
      // and a protected compact every third round — all while readers
      // hammer resolve
      for (i <- 1 to rounds) {
        graft.textfn.TermIndex.append(spark,
          Seq((900000L + i, s"spark merge vector round$i")).toDF("doc_id", "text"),
        term)
        ServingSnapshot.publish(snap, Map("sparse" -> term))
        if (i % 3 == 0)
          graft.textfn.TermIndex.compact(spark, term,
            protect = ServingSnapshot.protectedGens(snap, term))
      }
      done.set(true)
      readers.foreach(_.join(30000))
      assert(failures.isEmpty, s"race violations: ${failures.toArray.mkString("; ")}")

      import scala.jdk.CollectionConverters._
      val byVersion = observed.asScala.toSeq.groupBy(_._1)
      assert(byVersion.nonEmpty, "readers never observed a snapshot — vacuous race")
      // immutability: every observation of a version equals the post-race
      // resolveAt — and a version's census never varied across reads
      for ((v, obs) <- byVersion) {
        val now = ServingSnapshot.resolveAt(snap, v).legs
          .map { case (n, l) => n -> l.files }
        assert(obs.map(_._2).distinct == Seq(now),
          s"version $v: observed censuses varied or drifted from the manifest")
      }
      // the censuses were real cuts: each version's pinned probe sees
      // exactly its publish-time corpus (round i's doc present iff the
      // observed version was published at round >= i). Spot-pin the
      // earliest and latest observed versions.
      val vs = byVersion.keySet
      val (vMin, vMax) = (vs.min, vs.max)
      def probedDocs(v: Long): Set[Long] =
        graft.textfn.TermIndex.probePinned(spark,
          ServingSnapshot.resolveAt(snap, v).legs("sparse"), Terms, 50)
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val early = probedDocs(vMin)
      val late = probedDocs(vMax)
      assert((900000L + vMin) <= 900000L + rounds && early.contains(900000L + vMin))
      assert(!early.contains(900000L + vMax) || vMin == vMax)
      assert(late.contains(900000L + vMax))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
