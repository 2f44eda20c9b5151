package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cross-invocation staging cache (r17, VERDICT r16 item 2b).
  * Tests drive the package-private `frameIn`/`dirIn` overloads with an
  * explicit root — the global default stays OFF in the shared test JVM
  * (suites run concurrently; see the StageCache scaladoc), and is
  * turned on only by the gate mains. */
class StageCacheSpec extends AnyFunSuite with SparkFixture {

  private val data = "/root/testdata/sf0.001"

  private def withRoot[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stagecache").toString
    try f(tmp)
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("frame: miss builds once and writes; hit never runs the build and " +
    "serves the IDENTICAL rows; a testdata or tier-version change misses " +
    "again and sweeps the stale entry") {
    withRoot { root =>
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      def build = {
        builds.incrementAndGet()
        Tables(spark, data).documents
          .select(col("doc_id"), length(col("text")).as("len"))
          .filter(col("doc_id") % 3 === 0)
      }
      StageCache.drainEvents()
      val a = StageCache.frameIn(Some(root), spark, data, "sc_test", 1)(build)
      val aRows = a.collect().map(_.toSeq).toSet
      assert(builds.get() == 1)
      val b = StageCache.frameIn(Some(root), spark, data, "sc_test", 1)(build)
      assert(builds.get() == 1, "cache hit re-ran the build")
      assert(b.collect().map(_.toSeq).toSet == aRows, "hit served different rows")
      assert(b.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        a.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        "hit changed column order or types")
      // filter to this tier: concurrent suites' cache-off staged builds
      // also record events into the shared queue
      assert(StageCache.drainEvents()
        .filter(_._1 == "sc_test").map(_._2) == Seq("miss", "hit"))
      // a tier-version bump is a fresh key — rebuild. The sweep is
      // AGE-GUARDED (a concurrent gate JVM may still read the old
      // entry), so the young v1 entry survives this miss...
      val aCount = aRows.size.toLong
      val c = StageCache.frameIn(Some(root), spark, data, "sc_test", 2)(build)
      assert(builds.get() == 2 && c.count() == aCount)
      def entries() = Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty).map(_.getName).filter(_.startsWith("sc_test_v"))
        .sorted.toSeq
      assert(entries().count(_.startsWith("sc_test_v1_")) == 1,
        "age guard violated: a young entry was swept mid-session")
      // ...and goes once it has aged past the guard (backdated here)
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("sc_test_v1_"))
        .foreach(f => f.setLastModified(System.currentTimeMillis() - 3L * 3600 * 1000))
      StageCache.frameIn(Some(root), spark, data, "sc_test", 3)(build).count()
      assert(!entries().exists(_.startsWith("sc_test_v1_")),
        s"aged v1 entry not swept: ${entries().mkString(",")}")
    }
  }

  test("frame hit path is EAGER: the read-back frame's persist level is " +
    "filled before the call returns, so staging owns the cost (VERDICT r17)") {
    withRoot { root =>
      def build = Tables(spark, data).documents
        .select(col("doc_id"), length(col("text")).as("len"))
      val lvl = Some(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val miss = StageCache.frameIn(Some(root), spark, data, "sc_eager", 1,
        persist = lvl)(build)
      // pre-fix, a HIT returned a LAZY parquet read-back: the persist
      // level stayed empty until the first consuming query paid the
      // read, shifting staged materialization out of the staging timer
      // (warm dedup_containment 4.6 s vs 1.0 s cold, §7 r17)
      val hit = StageCache.frameIn(Some(root), spark, data, "sc_eager", 1,
        persist = lvl)(build)
      assert(org.apache.spark.sql.GraftSqlBridge.isCacheMaterialized(hit),
        "cache hit returned a lazy frame — staged cost lands in the first query")
      assert(hit.collect().map(_.toSeq).toSet ==
        miss.collect().map(_.toSeq).toSet)
      miss.unpersist(); hit.unpersist(); ()
    }
  }

  test("fingerprint reads mtime at filesystem precision: a same-size " +
    "same-millisecond rewrite still rotates the key (ADVICE r17)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fpns")
    try {
      val f = dir.resolve("data.bin")
      java.nio.file.Files.write(f, Array[Byte](1, 2, 3))
      val t0 = java.nio.file.Files.getLastModifiedTime(f)
      val fp0 = StageCache.fingerprint(dir.toString)
      // same size, same MILLISECOND, different nanos — the coarse
      // (File.lastModified) fingerprint could not see this rewrite
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.from(
          t0.toInstant.plusNanos(250000)))
      val fp1 = StageCache.fingerprint(dir.toString)
      // only assert where the FS actually stores sub-ms mtimes (tmpfs
      // and ext4 do; a truncating FS would make this vacuous)
      val nsVisible = java.nio.file.Files.getLastModifiedTime(f)
        .to(java.util.concurrent.TimeUnit.NANOSECONDS) !=
        t0.to(java.util.concurrent.TimeUnit.NANOSECONDS)
      assume(nsVisible, "filesystem truncates sub-millisecond mtimes")
      assert(fp0 != fp1,
        "a sub-millisecond mtime change did not rotate the fingerprint")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("dir: miss populates, hit reuses the same stable path; cache off " +
    "falls back to a fresh temp dir flagged non-cached") {
    withRoot { root =>
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      def build(into: String): Unit = {
        builds.incrementAndGet()
        spark.range(5).write.mode("overwrite").parquet(s"$into/data")
      }
      val (d1, c1) = StageCache.dirIn(Some(root), spark, data, "sc_dir", 1,
        "graft_sctest")(build)
      val (d2, c2) = StageCache.dirIn(Some(root), spark, data, "sc_dir", 1,
        "graft_sctest")(build)
      assert(c1 && c2 && d1 == d2 && builds.get() == 1)
      assert(spark.read.parquet(s"$d2/data").count() == 5)
      assert(StageCache.isCachePathIn(Some(root), d1))
      val (d3, c3) = StageCache.dirIn(None, spark, data, "sc_dir", 1,
        "graft_sctest")(build)
      assert(!c3 && d3 != d1 && builds.get() == 2)
      assert(!StageCache.isCachePathIn(Some(root), d3))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d3))
      ()
    }
  }

  test("two sessions racing the same key: exactly one build wins the " +
    "atomic move, both read the same completed entry") {
    withRoot { root =>
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      // simulate the cross-JVM race at the materialize seam: two
      // threads, same key, builds slow enough to overlap
      def build(into: String): Unit = {
        builds.incrementAndGet()
        Thread.sleep(200)
        spark.range(3).write.mode("overwrite").parquet(s"$into/data")
      }
      val results = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (1 to 2).map(_ => new Thread(() => {
        try {
          val (d, _) = StageCache.dirIn(Some(root), spark, data, "sc_race", 1,
            "graft_scrace")(build)
          results.add(d); ()
        } catch { case t: Throwable => errors.add(t); () }
      }))
      threads.foreach(_.start()); threads.foreach(_.join(60000))
      import scala.jdk.CollectionConverters._
      assert(errors.isEmpty, s"racer threw: ${errors.asScala.toSeq}")
      val dirs = results.asScala.toSeq
      assert(dirs.size == 2 && dirs.distinct.size == 1,
        s"racers resolved different paths: $dirs")
      assert(spark.read.parquet(s"${dirs.head}/data").count() == 3)
      // no stranded tmp dirs survive the race
      val leftovers = Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty).map(_.getName).filter(_.contains(".tmp-"))
      assert(leftovers.isEmpty, s"stranded tmp dirs: ${leftovers.mkString(",")}")
    }
  }
}
