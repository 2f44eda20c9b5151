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

  private def offendingPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(s"$path: ${dt.catalogString}")
    case s: StructType =>
      s.fields.toSeq.flatMap(f => offendingPaths(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => offendingPaths(a.elementType, s"$path[]")
    case m: MapType =>
      offendingPaths(m.keyType, s"$path<key>") ++
        offendingPaths(m.valueType, s"$path<value>")
    case _ => Nil
  }

  private lazy val schemas: Seq[(String, StructType)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, dir).schema
    }

  test("no query output schema carries a DECIMAL column, at any nesting") {
    val offenders = schemas.flatMap { case (name, schema) =>
      schema.fields.toSeq.flatMap(f => offendingPaths(f.dataType, s"$name.${f.name}"))
    }
    assert(offenders.isEmpty,
      s"bare DECIMAL output columns (cast to DOUBLE at the boundary, §5): ${offenders.mkString(", ")}")
  }

  test("every TIMESTAMP output column is second-aligned (no sub-second instants)") {
    val tsQueries = schemas.collect {
      case (name, schema) if schema.fields.exists(f =>
        f.dataType == TimestampType || f.dataType == TimestampNTZType) =>
        name -> schema.fields.filter(f =>
          f.dataType == TimestampType || f.dataType == TimestampNTZType).map(_.name).toSeq
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
