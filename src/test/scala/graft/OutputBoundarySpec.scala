package graft

import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The §5 output-boundary house rule, enforced by machine instead of
  * memory (VERDICT r10 item 1): no query may surface a bare DECIMAL or
  * sub-second TIMESTAMP output column. The driver's correctness gate
  * hashes rendered values, and its hasher and DuckDB render those two
  * types differently — a query can be value-identical to its oracle in
  * every cell and still hash-FAIL (r4 `avro_logical_types`; relearned
  * in r10 when `text_perplexity`/`text_perplexity_bigram`/
  * `text_tfidf_keywords` shipped DECIMAL(28,6) sums). Internal decimal
  * arithmetic stays (it is the exactness discipline); only the OUTPUT
  * schema is constrained.
  *
  * The schema walk is analysis-only (building each query's DataFrame;
  * driver-tier queries may run their bounded driver jobs at sf0.001 —
  * the same cost QueriesSmokeSpec already pays). The timestamp value
  * check then runs only the queries that actually emit TIMESTAMP
  * columns and asserts every instant is second-aligned.
  */
class OutputBoundarySpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def offendingPaths(dt: DataType, path: String)(
      bad: DataType => Boolean): Seq[String] = dt match {
    case t if bad(t) => Seq(s"$path: ${dt.catalogString}")
    case s: StructType =>
      s.fields.toSeq.flatMap(f => offendingPaths(f.dataType, s"$path.${f.name}")(bad))
    case a: ArrayType => offendingPaths(a.elementType, s"$path[]")(bad)
    case m: MapType =>
      offendingPaths(m.keyType, s"$path<key>")(bad) ++
        offendingPaths(m.valueType, s"$path<value>")(bad)
    case _ => Nil
  }

  private def isTimestamp(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private lazy val schemas: Seq[(String, StructType)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, dir).schema
    }

  test("no query output schema carries a DECIMAL column, at any nesting") {
    val offenders = schemas.flatMap { case (name, schema) =>
      schema.fields.toSeq.flatMap(f =>
        offendingPaths(f.dataType, s"$name.${f.name}")(_.isInstanceOf[DecimalType]))
    }
    assert(offenders.isEmpty,
      s"bare DECIMAL output columns (cast to DOUBLE at the boundary, §5): ${offenders.mkString(", ")}")
  }

  test("no query output carries a non-atomic TOP-LEVEL column (array/map/struct)") {
    // third boundary class, learned in r13: the driver's gate
    // pandas-sorts EVERY output (even no-oracle ones) to canonicalize
    // it, and sort_values on an ndarray cell raises `unhashable type`
    // — embed_whiten's raw array<double> column was the round's only
    // FAIL, crashing before the harness could even count rows. Vectors
    // must cross the boundary as scalars (norm / leading components /
    // a rounded digest); the full-width frame stays an internal API.
    val offenders = schemas.flatMap { case (name, schema) =>
      schema.fields.toSeq.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.catalogString}"
      }
    }
    assert(offenders.isEmpty,
      s"non-atomic top-level output columns (driver's pandas sort crashes on these, §5): ${offenders.mkString(", ")}")
  }

  test("no query output schema NESTS a timestamp (value check cannot reach it)") {
    // the second-alignment value check below only drives top-level
    // columns; a timestamp buried in a struct/array/map would dodge it,
    // so nesting one is itself a boundary violation — surface the
    // instant as a top-level column (or extend the value walk)
    val offenders = schemas.flatMap { case (name, schema) =>
      schema.fields.toSeq.filterNot(f => isTimestamp(f.dataType)).flatMap(f =>
        offendingPaths(f.dataType, s"$name.${f.name}")(isTimestamp))
    }
    assert(offenders.isEmpty,
      s"nested timestamp output columns (§5): ${offenders.mkString(", ")}")
  }

  test("every TIMESTAMP output column is second-aligned (no sub-second instants)") {
    val tsQueries = schemas.collect {
      case (name, schema) if schema.fields.exists(f => isTimestamp(f.dataType)) =>
        name -> schema.fields.filter(f => isTimestamp(f.dataType)).map(_.name).toSeq
    }
    tsQueries.foreach { case (name, cols) =>
      val df = SparkEntry.queries(name)(spark, dir)
      cols.foreach { c =>
        // NTZ → TIMESTAMP under the fixture's UTC session tz: a shift
        // by a whole number of seconds, so second-alignment is invariant
        val bad = df.filter(
          unix_micros(col(c).cast(TimestampType)) % lit(1000000L) =!= 0L).count()
        assert(bad == 0L,
          s"$name.$c carries $bad sub-second timestamp values — truncate at the output boundary (§5)")
      }
    }
  }
}
