package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, built from
  * SQL higher-order functions (codegen-adjacent, no UDFs, no collect).
  *
  * Cross-engine exactness: both the Spark expression and its DuckDB
  * mirror cast each element to DOUBLE and LEFT-FOLD the products in
  * index order, so dot products (and everything derived) are
  * bit-identical for the oracle gate.
  */
object VectorOps {

  /** dot(a, b) as a left fold in array order. */
  def dot(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  def norm(a: String): Column = sqrt(dot(a, a))
  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  def cosine(a: String, b: String): Column = dot(a, b) / (norm(a) * norm(b))
  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  /** Native codegen'd cosine: the custom Catalyst expression
    * [[graft.expressions.CosineSimilarity]] as a Column — bit-identical
    * to [[cosine]]/[[cosineSql]], but inlined into whole-stage codegen.
    */
  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expressions.CosineSimilarity(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Native codegen'd inner product: [[graft.expressions.DotProduct]]
    * as a Column — bit-identical to [[dot]]/[[dotSql]] (same left fold,
    * same casts), inlined into whole-stage codegen. The MIPS scoring
    * primitive for `knn_mips_ann`. */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expressions.DotProduct(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Native codegen'd cosine with PRECOMPUTED squared norms (must be
    * the [[dotNative]] self-fold of each side) — bit-identical to
    * [[cosineNative]] unconditionally (see
    * [[graft.expressions.CosineWithNorms]]), but the pair-join hot
    * loop runs one multiply-add per element instead of three. Use on
    * blocked all-pairs verifies where each vector participates in many
    * candidate pairs. */
  def cosineWithNormsNative(a: Column, b: Column, na2: Column, nb2: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expressions.CosineWithNorms(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b),
        org.apache.spark.sql.GraftSqlBridge.expression(na2),
        org.apache.spark.sql.GraftSqlBridge.expression(nb2)))

  /** Compiled cosine kernel: appends a `cosine` double column computed in
    * a tight JVM loop over the two float-array columns. Bit-identical to
    * [[cosine]] / [[cosineSql]] (same left-fold order, same
    * float->double casts) but ~100x faster than the interpreted
    * higher-order-function path — use it on pair-join hot paths.
    */
  def cosineKernel(df: org.apache.spark.sql.DataFrame, aCol: String, bCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val aIdx = df.schema.fieldIndex(aCol)
    val bIdx = df.schema.fieldIndex(bCol)
    val outSchema = StructType(df.schema.fields :+ StructField("cosine", DoubleType, nullable = false))
    df.mapPartitions { iter =>
      iter.map { row =>
        val a = row.getSeq[Float](aIdx)
        val b = row.getSeq[Float](bIdx)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        Row.fromSeq(row.toSeq :+ dot / (math.sqrt(na) * math.sqrt(nb)))
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic random hyperplanes for cosine LSH: `planes(p)(d)` from
    * a fixed-seed generator (JVM LCG is specified, so this is stable
    * across runs and machines). Used as literal arrays — evaluated once,
    * broadcast with the plan, never per-row.
    */
  def hyperplanes(nPlanes: Int, dims: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dims)(rnd.nextGaussian())
  }

  /** Sign-bucket id for one band of hyperplanes: fold the sign bits of
    * `v · plane_p` into an int. */
  def signBucket(vecCol: String, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = s"array(${p.map(x => s"CAST($x AS DOUBLE)").mkString(",")})"
      (expr(s"aggregate(zip_with($vecCol, $planeLit, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)") > 0)
        .cast("int") * lit(1 << i)
    }.reduce(_ + _)
}
