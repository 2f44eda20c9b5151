package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the ServingSnapshot manifest encode/parse pair:
  * for ARBITRARY leg shapes (names, generation numbers, file lists —
  * the generator biases toward manifest-hostile content: dots, equals
  * signs, deep paths, many files), publishLegs → resolve must
  * round-trip the cut EXACTLY (names, gens, file lists in order), the
  * footer arithmetic must hold, and verify() must report precisely the
  * files that do not exist. Raw generators + seeds (the offline
  * scalacheck bridge convention of KernelPropertySpec). Leg dirs use
  * real temp directories because publishLegs qualifies them through
  * the filesystem. */
class SnapshotManifestPropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def sample[A](g: Gen[A], seed: Long, fallback: A): A =
    g.apply(params, Seed(seed)).getOrElse(fallback)

  private val nameGen: Gen[String] = Gen.listOfN(5, Gen.frequency(
    6 -> Gen.alphaNumChar,
    1 -> Gen.const('-'),
    1 -> Gen.const('.'),
    1 -> Gen.const('='))).map(cs => "l" + cs.mkString)

  private val fileGen: Gen[String] = for {
    depth <- Gen.choose(0, 3)
    segs <- Gen.listOfN(depth, Gen.identifier.map(_.take(8)))
    base <- Gen.identifier.map(_.take(10))
  } yield (segs :+ s"part-$base.parquet").mkString("/")

  test("publishLegs -> resolve round-trips arbitrary cuts exactly; " +
    "verify names exactly the nonexistent files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_snapprop").toString
    try {
      for (trial <- 0 until 25) {
        val snap = s"$tmp/snap$trial"
        val nLegs = 1 + trial % 4
        val legs = (0 until nLegs).map { i =>
          val name = sample(nameGen, 100L * trial + i, s"leg$i") + s"_$i"
          val dir = s"$tmp/idx${trial}_$i"
          val gen = sample(Gen.choose(0L, 1L << 40), 200L * trial + i, 0L)
          val nFiles = 1 + sample(Gen.choose(0, 30), 300L * trial + i, 0)
          val files = (0 until nFiles).map { j =>
            sample(fileGen, 400L * trial + 31 * i + j, s"part-$j.parquet")
          }.distinct
          name -> ServingSnapshot.Leg(dir, gen, files)
        }.toMap
        val v = ServingSnapshot.publishLegs(snap, legs)
        val got = ServingSnapshot.resolveAt(snap, v)
        assert(got.version == v)
        assert(got.legs.keySet == legs.keySet, s"trial $trial: leg names")
        for ((name, leg) <- legs) {
          val g = got.legs(name)
          assert(g.gen == leg.gen, s"trial $trial/$name: gen")
          assert(g.files == leg.files, s"trial $trial/$name: files")
          // dir comes back qualified — same filesystem object
          assert(g.dir == ServingSnapshot.qualified(leg.dir),
            s"trial $trial/$name: dir")
        }
        // none of the generated files exist — verify must name ALL of
        // them (and nothing else)
        val missing = ServingSnapshot.verify(got).toSet
        val expected = got.legs.valuesIterator.flatMap(l =>
          l.files.map(f => s"${l.dir}/gen=${l.gen}/$f")).toSet
        assert(missing == expected, s"trial $trial: verify mismatch")
        // the SPLIT form (r17, forced via splitOver = 0) is a pure
        // encoding change: the same arbitrary cut must resolve to the
        // identical snapshot through per-leg manifest files
        val snapSplit = s"$tmp/snapsplit$trial"
        val vS = ServingSnapshot.publishLegs(snapSplit, legs, splitOver = 0)
        val gotS = ServingSnapshot.resolveAt(snapSplit, vS)
        assert(gotS.version == v && gotS.legs == got.legs,
          s"trial $trial: split/inline cut drift")
        assert(ServingSnapshot.verify(gotS).toSet == expected,
          s"trial $trial: split-form verify mismatch")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
