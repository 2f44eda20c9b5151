package graft.avro

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based fuzzing of the CP1 wire layer: the consume loop's
  * first line of defense must TOTAL-FUNCTION every byte array — never
  * throw, always classify (the reference counts these failures rather
  * than crashing, `src/main.cpp:247-251`). Uses raw scalacheck
  * generators with deterministic seeds (the scalatest bridge artifact
  * isn't on the offline classpath).
  */
class FramingPropertySpec extends AnyFunSuite {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Arbitrary.arbitrary[Byte])
  private val params = Gen.Parameters.default

  private def sampleBytes(seed: Long): Array[Byte] =
    bytesGen.apply(params, Seed(seed)).getOrElse(Array.empty)

  test("frame -> unframe roundtrips any (schemaId, body)") {
    (0 until 500).foreach { i =>
      val id = Arbitrary.arbitrary[Int].apply(params, Seed(i.toLong)).getOrElse(0)
      val body = sampleBytes(1000L + i)
      ConfluentFraming.unframe(ConfluentFraming.frame(id, body)) match {
        case ConfluentFraming.Framed(gotId, b, off, len) =>
          assert(gotId == id)
          assert(java.util.Arrays.copyOfRange(b, off, off + len).sameElements(body))
        case other => fail(s"roundtrip failed for seed $i: $other")
      }
    }
  }

  test("unframe never throws and classifies every byte array") {
    (0 until 1000).foreach { i =>
      val bytes = sampleBytes(i.toLong)
      ConfluentFraming.unframe(bytes) match {
        case ConfluentFraming.Truncated => assert(bytes.length < ConfluentFraming.HeaderLen)
        case ConfluentFraming.BadMagic =>
          assert(bytes.length >= ConfluentFraming.HeaderLen && bytes(0) != ConfluentFraming.Magic)
        case ConfluentFraming.Framed(id, _, off, len) =>
          assert(bytes(0) == ConfluentFraming.Magic)
          assert(off == ConfluentFraming.HeaderLen && len == bytes.length - off)
          assert(id == (((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
            ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)))
      }
    }
  }

  test("schema id extraction agrees with the native expression semantics") {
    // ConfluentSchemaId (the codegen'd expression) and unframe must agree
    // on every input: same id on valid frames, null exactly when rejected
    (0 until 1000).foreach { i =>
      val bytes = sampleBytes(5000L + i)
      val viaExpr = graft.expressions.ConfluentSchemaId(
        org.apache.spark.sql.catalyst.expressions.Literal(bytes)).eval(null)
      ConfluentFraming.unframe(bytes) match {
        case ConfluentFraming.Framed(id, _, _, _) => assert(viaExpr == id)
        case _ => assert(viaExpr == null)
      }
    }
  }
}
