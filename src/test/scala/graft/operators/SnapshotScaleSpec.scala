package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The r17 scale layer of the snapshot tier (VERDICT r16 item 3 +
  * ADVICE r16): the Iceberg-style manifest-list SPLIT (a big cut's
  * version file names per-leg manifest files instead of inlining the
  * census, footer discipline per file), the BATCHED verify (one
  * listing per pinned generation directory — call complexity asserted
  * on a counting filesystem, not argued), completeness-aware retire
  * (a torn newest version must not consume the keep budget), and the
  * publish-time path validation (a tab/newline in a pinned path fails
  * the PUBLISH loudly instead of producing a permanently-unparseable
  * version). */
class SnapshotScaleSpec extends AnyFunSuite with SparkFixture {

  private def mkLeg(root: String, name: String, nDirs: Int, perDir: Int,
                    gen: Long = 0L): ServingSnapshot.Leg = {
    val dir = s"$root/$name"
    val files = for (d <- 0 until nDirs; f <- 0 until perDir) yield {
      val rel = s"postings/shard=$d/part-$f.parquet"
      IndexFs.createMarker(s"$dir/gen=$gen/$rel", "x")
      rel
    }
    ServingSnapshot.Leg(dir, gen, files.sorted)
  }

  private def withTmp[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_snapscale").toString
    try f(tmp)
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("split form round-trips exactly like the inline form, writes " +
    "per-leg manifest files, serves protectedGensAll, and retires " +
    "its leg manifests with the version") {
    withTmp { tmp =>
      val legs = Map(
        "sparse" -> mkLeg(tmp, "term", nDirs = 4, perDir = 6),
        "dense" -> mkLeg(tmp, "vec", nDirs = 2, perDir = 5, gen = 3L))
      val inline = s"$tmp/snap_inline"
      val split = s"$tmp/snap_split"
      val vi = ServingSnapshot.publishLegs(inline, legs)
      val vs = ServingSnapshot.publishLegs(split, legs, splitOver = 0)
      // the version file references per-leg manifests instead of
      // inlining 34 census lines; names carry the per-publish nonce
      // (r18) between the version and the leg
      val markers = IndexFs.list(split).map(_.getPath.getName).sorted
      assert(markers.exists(n => n.startsWith("_snapleg.v=1.") &&
          n.endsWith(".sparse")) &&
        markers.exists(n => n.startsWith("_snapleg.v=1.") &&
          n.endsWith(".dense")), markers.mkString(","))
      assert(IndexFs.readSmall(s"$split/_snap.v=1").linesIterator
        .count(_.startsWith("@leg\t")) == 2)
      // both forms resolve to the SAME cut
      val si = ServingSnapshot.resolveAt(inline, vi)
      val ss = ServingSnapshot.resolveAt(split, vs)
      assert(ss.legs == si.legs && ss.version == si.version)
      assert(ServingSnapshot.verify(ss).isEmpty)
      // a single-leg metadata consumer works through the split form
      assert(ServingSnapshot.protectedGens(split, s"$tmp/vec") == Set(3L))
      // a second (split) publish + retire removes the old version's leg
      // manifests along with its version file
      ServingSnapshot.publishLegs(split, legs, splitOver = 0)
      ServingSnapshot.retire(split, keepLatest = 1)
      val after = IndexFs.list(split).map(_.getPath.getName).toSet
      assert(!after.exists(_.startsWith("_snapleg.v=1.")),
        s"retired version's leg manifests survived: $after")
      assert(after.contains("_snap.v=2") &&
        after.exists(n => n.startsWith("_snapleg.v=2.") && n.endsWith(".sparse")))
      assert(ServingSnapshot.resolve(split).version == 2L)
    }
  }

  test("a split version with a missing or torn leg manifest is IN-FLIGHT: " +
    "resolve falls back, resolveAt names the cause") {
    withTmp { tmp =>
      val legs = Map("sparse" -> mkLeg(tmp, "term", nDirs = 2, perDir = 3))
      val snap = s"$tmp/snap"
      ServingSnapshot.publishLegs(snap, legs, splitOver = 0) // v1 complete
      val v2 = ServingSnapshot.publishLegs(snap, legs, splitOver = 0)
      // the nonce'd leg filename the version file actually references
      def refOf(v: Long): String = IndexFs.readSmall(s"$snap/_snap.v=$v")
        .linesIterator.find(_.startsWith("@leg\t")).get.split("\t", 4)(2)
      // the retire race / crashed-publish shape: version file present,
      // a referenced leg manifest gone
      IndexFs.delete(s"$snap/${refOf(v2)}")
      assert(ServingSnapshot.resolve(snap).version == 1L,
        "resolve served a split version whose leg manifest is missing")
      val e = intercept[IllegalArgumentException] {
        ServingSnapshot.resolveAt(snap, v2)
      }
      assert(e.getMessage.contains("incomplete"), e.getMessage)
      // same for a torn (footer-less) leg manifest
      val v3 = ServingSnapshot.publishLegs(snap, legs, splitOver = 0)
      IndexFs.writeSmall(s"$snap/${refOf(v3)}", "sparse\tx\t0\ty.parquet")
      assert(ServingSnapshot.resolve(snap).version == 1L)
    }
  }

  test("a corrupt-but-footer-complete manifest reads as unusable, never " +
    "as an outage: resolve falls back, resolveAt names it, retire sweeps it") {
    withTmp { tmp =>
      val legs = Map("sparse" -> mkLeg(tmp, "term", nDirs = 1, perDir = 2))
      val snap = s"$tmp/snap"
      ServingSnapshot.publishLegs(snap, legs) // v1 complete and well-formed
      // v2: footer arithmetic holds but the body is garbage (a
      // truncated line and a non-numeric generation — disk corruption
      // or a foreign writer). Pre-r17 this threw a MatchError /
      // NumberFormatException out of EVERY resolve and protected
      // compact of the directory.
      IndexFs.writeSmall(s"$snap/_snap.v=2",
        "sparse-no-tabs-here\nsparse\tdir\tNOTANUMBER\tf.parquet\n#complete n=2")
      assert(ServingSnapshot.resolve(snap).version == 1L,
        "resolve crashed or served a corrupt manifest")
      assert(ServingSnapshot.protectedGensAll(snap).nonEmpty)
      val e = intercept[IllegalArgumentException] {
        ServingSnapshot.resolveAt(snap, 2L)
      }
      assert(e.getMessage.contains("incomplete"), e.getMessage)
      // a later publish supersedes it; retire sweeps the corrupt
      // version below the cut like any other garbage
      val v3 = ServingSnapshot.publishLegs(snap, legs)
      ServingSnapshot.retire(snap, keepLatest = 1)
      assert(!IndexFs.exists(s"$snap/_snap.v=2"))
      assert(ServingSnapshot.resolve(snap).version == v3)
    }
  }

  test("retire counts only COMPLETE versions toward the keep budget: a " +
    "torn newest version cannot starve resolve; torn versions below " +
    "the cut are swept") {
    withTmp { tmp =>
      val legs = Map("sparse" -> mkLeg(tmp, "term", nDirs = 1, perDir = 2))
      val snap = s"$tmp/snap"
      ServingSnapshot.publishLegs(snap, legs) // v1 complete
      // a crashed publish leaves a torn NEWEST version
      IndexFs.createMarker(s"$snap/_snap.v=2", "")
      // ADVICE r16: dropRight-over-all would keep only torn v2 here and
      // delete the single complete version, wedging resolve until the
      // next successful publish
      ServingSnapshot.retire(snap, keepLatest = 1)
      assert(IndexFs.exists(s"$snap/_snap.v=1"),
        "retire deleted the only complete version to keep a torn one")
      assert(ServingSnapshot.resolve(snap).version == 1L)
      assert(ServingSnapshot.currentVersion(snap) == 2L,
        "the in-flight version above the cut must keep owning its number")
      // the next successful publish supersedes both; torn v2 now sits
      // BELOW the cut and is crashed-publish garbage — swept
      val v3 = ServingSnapshot.publishLegs(snap, legs)
      ServingSnapshot.retire(snap, keepLatest = 1)
      assert(!IndexFs.exists(s"$snap/_snap.v=1"))
      assert(!IndexFs.exists(s"$snap/_snap.v=2"),
        "torn version below the cut survived retirement")
      assert(ServingSnapshot.resolve(snap).version == v3)
    }
  }

  test("verify is O(directories), not O(files): one listing per pinned " +
    "generation directory on a counting filesystem") {
    spark.sparkContext.hadoopConfiguration.set("fs.graftcnt.impl",
      classOf[graft.testfs.CountingFileSystem].getName)
    withTmp { local =>
      val tmp = s"graftcnt://$local"
      val legs = Map(
        "sparse" -> mkLeg(tmp, "term", nDirs = 8, perDir = 25), // 200 files
        "dense" -> mkLeg(tmp, "vec", nDirs = 4, perDir = 25))   // 100 files
      val snap = s"$tmp/snap"
      val v = ServingSnapshot.publishLegs(snap, legs)
      val snapshot = ServingSnapshot.resolveAt(snap, v)
      val nFiles = snapshot.legs.valuesIterator.map(_.files.size).sum
      assert(nFiles == 300)
      graft.testfs.CountingFileSystem.reset()
      assert(ServingSnapshot.verify(snapshot).isEmpty)
      val calls = graft.testfs.CountingFileSystem.total
      // 2 generation roots + 14 shard dirs + a constant few stats; the
      // pre-r17 shape was >= 300 exists calls (one per pinned file)
      assert(calls <= 40, s"verify made $calls metadata calls for " +
        s"$nFiles pinned files — O(files), not O(dirs)")
      // still finds real damage: delete two pinned files, verify names
      // exactly those two, still in O(dirs) calls
      val leg = snapshot.legs("sparse")
      val victims = Seq(leg.files.head, leg.files.last)
        .map(f => s"${leg.dir}/gen=${leg.gen}/$f")
      victims.foreach(IndexFs.delete)
      graft.testfs.CountingFileSystem.reset()
      assert(ServingSnapshot.verify(snapshot) == victims.sorted)
      assert(graft.testfs.CountingFileSystem.total <= 40)
    }
  }

  test("resolve survives a publish+retire race: readers hammering resolve " +
    "against a publisher that retires aggressively never see a spurious " +
    "'no complete snapshot' after the first publish") {
    withTmp { tmp =>
      val legs = Map("sparse" -> mkLeg(tmp, "term", nDirs = 1, perDir = 2))
      val snap = s"$tmp/snap"
      val published = new java.util.concurrent.atomic.AtomicBoolean(false)
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val resolves = new java.util.concurrent.atomic.AtomicLong(0L)
      val readers = (1 to 2).map { _ =>
        new Thread(() => {
          while (!done.get()) {
            // ADVICE r16: resolve iterates a listing taken once; a
            // concurrent publish+retire can delete every LISTED version
            // after the listing even though a newer complete version
            // exists — the re-list retry makes old-or-new hold here
            try {
              ServingSnapshot.resolve(snap); resolves.incrementAndGet(); ()
            } catch {
              case e: IllegalArgumentException
                  if !published.get() &&
                    e.getMessage.contains("no complete snapshot") => ()
              case t: Throwable => failures.add(s"reader: $t")
            }
          }
        })
      }
      readers.foreach(_.start())
      for (_ <- 1 to 200) {
        ServingSnapshot.publishLegs(snap, legs)
        published.set(true)
        // keepLatest = 2 keeps the spurious-throw window to "two full
        // publish+retire cycles inside one reader parse" per attempt —
        // the retry covers the race without making the TEST a coin flip
        // on scheduler timing
        ServingSnapshot.retire(snap, keepLatest = 2)
      }
      done.set(true)
      readers.foreach(_.join(30000))
      assert(failures.isEmpty, s"race violations: ${failures.toArray.mkString("; ")}")
      assert(resolves.get() > 0, "readers never resolved — vacuous race")
    }
  }

  test("two publishers racing the same version can never cross their leg " +
    "censuses: nonce'd no-overwrite leg manifests (ADVICE r17)") {
    withTmp { tmp =>
      // each publisher pins its OWN index dirs, so a crossed census is
      // detectable from the resolved legs' dir spellings
      val legsA = Map(
        "sparse" -> mkLeg(tmp, "termA", nDirs = 1, perDir = 3),
        "dense" -> mkLeg(tmp, "vecA", nDirs = 1, perDir = 3))
      val legsB = Map(
        "sparse" -> mkLeg(tmp, "termB", nDirs = 1, perDir = 4),
        "dense" -> mkLeg(tmp, "vecB", nDirs = 1, perDir = 4))
      val snap = s"$tmp/snap"
      // lockstep rounds for maximal same-version contention: both
      // threads list, allocate the same v, write their leg files, and
      // race the version-file create — the loser must crash loudly
      // (the inline form's contract) and, post-fix, must be unable to
      // have overwritten the winner's leg census first
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val published = new java.util.concurrent.atomic.AtomicLong(0L)
      def publisher(legs: Map[String, ServingSnapshot.Leg]) = new Thread(() => {
        for (_ <- 1 to 40) {
          barrier.await(10, java.util.concurrent.TimeUnit.SECONDS)
          try {
            ServingSnapshot.publishLegs(snap, legs, splitOver = 0)
            published.incrementAndGet(); ()
          } catch { case _: Throwable => () } // lost the version race
        }
      })
      val ts = Seq(publisher(legsA), publisher(legsB))
      ts.foreach(_.start()); ts.foreach(_.join(60000))
      assert(published.get() > 0, "no publish ever succeeded — vacuous race")
      def tagOf(leg: ServingSnapshot.Leg): String =
        if (leg.dir.contains("termA") || leg.dir.contains("vecA")) "A" else "B"
      for (v <- 1L to ServingSnapshot.currentVersion(snap)) {
        val s = try Some(ServingSnapshot.resolveAt(snap, v))
                catch { case _: IllegalArgumentException => None }
        s.foreach { snapv =>
          val tags = snapv.legs.valuesIterator.map(tagOf).toSet
          assert(tags.size == 1,
            s"version $v serves a MIXED census across publishers: " +
              snapv.legs.view.mapValues(_.dir).toMap)
          // and the census is the full two-leg cut of that publisher
          assert(snapv.legs.keySet == Set("sparse", "dense"))
          val want = if (tags.head == "A") legsA else legsB
          assert(snapv.legs("sparse").files == want("sparse").files &&
            snapv.legs("dense").files == want("dense").files,
            s"version $v census does not match publisher ${tags.head}")
        }
      }
    }
  }

  test("retire sweeps orphaned leg manifests whose version file is gone, " +
    "but never an in-flight publish's legs above the listed max (ADVICE r17)") {
    withTmp { tmp =>
      val legs = Map("sparse" -> mkLeg(tmp, "term", nDirs = 1, perDir = 2))
      val snap = s"$tmp/snap"
      ServingSnapshot.publishLegs(snap, legs, splitOver = 0) // v1
      ServingSnapshot.publishLegs(snap, legs, splitOver = 0) // v2
      // a retire that crashed between deleting v1's version file and
      // its leg manifests: pre-r18, later retires only swept legs of
      // versions still listed, stranding these forever
      IndexFs.delete(s"$snap/_snap.v=1")
      // an in-flight publish above the listed max: leg manifest landed,
      // version file not yet — must survive every sweep
      IndexFs.createMarker(s"$snap/_snapleg.v=3.deadbeef.sparse",
        "sparse\tx\t0\ty.parquet\n#complete n=1")
      ServingSnapshot.retire(snap, keepLatest = 1)
      val names = IndexFs.list(snap).map(_.getPath.getName).toSet
      assert(!names.exists(_.startsWith("_snapleg.v=1.")),
        s"orphaned v1 leg manifests survived the sweep: $names")
      assert(names.exists(_.startsWith("_snapleg.v=2.")),
        "swept the live version's leg manifests")
      assert(names.contains("_snapleg.v=3.deadbeef.sparse"),
        "swept an in-flight publish's leg manifest")
      assert(ServingSnapshot.resolve(snap).version == 2L)
    }
  }

  test("publish refuses a pinned path containing a tab or newline loudly " +
    "instead of writing a permanently-unparseable version") {
    withTmp { tmp =>
      val good = mkLeg(tmp, "term", nDirs = 1, perDir = 2)
      val snap = s"$tmp/snap"
      val eFile = intercept[IllegalArgumentException] {
        ServingSnapshot.publishLegs(snap,
          Map("sparse" -> good.copy(files = good.files :+ "bad\tname.parquet")))
      }
      assert(eFile.getMessage.contains("tab or newline"), eFile.getMessage)
      val eNl = intercept[IllegalArgumentException] {
        ServingSnapshot.publishLegs(snap,
          Map("sparse" -> good.copy(files = good.files :+ "bad\nname.parquet")))
      }
      assert(eNl.getMessage.contains("tab or newline"), eNl.getMessage)
      val eName = intercept[IllegalArgumentException] {
        ServingSnapshot.publishLegs(snap, Map("a/b" -> good))
      }
      assert(eName.getMessage.contains("leg name"), eName.getMessage)
      // nothing was published by the refused attempts
      intercept[IllegalArgumentException] { ServingSnapshot.resolve(snap) }
    }
  }
}
