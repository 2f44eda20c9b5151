package graft.expressions

import graft.SparkFixture
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite with SparkFixture {

  test("jaccard_sorted matches the SQL set formulation on word sets") {
    val docs = graft.operators.Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), array_sort(array_distinct(split(lower(col("text")), " "))).as("ws"))
      .limit(50)
    val pairs = docs.select(col("doc_id").as("a"), col("ws").as("wa"))
      .crossJoin(docs.select(col("doc_id").as("b"), col("ws").as("wb")))
      .filter(col("a") < col("b"))
    val native = pairs.withColumn("j", GraftSqlBridge.column(JaccardSorted(
      GraftSqlBridge.expression(col("wa")), GraftSqlBridge.expression(col("wb")))))
    val viaSql = pairs.withColumn("j",
      expr("CAST(size(array_intersect(wa, wb)) AS DOUBLE) / (size(wa) + size(wb) - size(array_intersect(wa, wb)))"))
    val n = native.select("a", "b", "j").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._2))
    val s = viaSql.select("a", "b", "j").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(x => (x._1, x._2))
    assert(n.length == s.length && n.length > 0)
    n.zip(s).foreach { case (x, y) => assert(x == y) }
  }

  test("jaccard_sorted over array<int> equals the string-set result under a bijective id map") {
    import spark.implicits._
    // hand-built sorted id sets incl. edge shapes: identical, disjoint,
    // single-element overlap, negative ids (ordering still int order)
    val cases = Seq(
      (Seq(1, 2, 3), Seq(1, 2, 3), 1.0),
      (Seq(1, 2), Seq(3, 4), 0.0),
      (Seq(-5, 0, 7), Seq(-5, 9, 11), 1.0 / 5.0),
      (Seq(1), Seq(1), 1.0),
      (Seq(1, 2, 3, 4), Seq(2, 3), 0.5)
    )
    val df = cases.zipWithIndex
      .map { case ((a, b, exp), i) => (i, a, b, exp) }
      .toDF("i", "a", "b", "expected")
    val out = df.withColumn("j", GraftSqlBridge.column(JaccardSorted(
        GraftSqlBridge.expression(col("a")), GraftSqlBridge.expression(col("b")))))
      .select("i", "j", "expected").collect()
    out.foreach(r => assert(r.getDouble(1) == r.getDouble(2), s"case ${r.getInt(0)}"))
    // and against the dedup path's own derivation: dense-rank the words
    // of real docs, compare int-set jaccard to string-set jaccard
    val docs = graft.operators.Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), array_sort(array_distinct(split(lower(col("text")), " "))).as("ws"))
      .limit(30)
    val tok = docs.select(col("doc_id"), explode(col("ws")).as("w"))
    val ids = tok.select(col("w")).distinct()
      .withColumn("tid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("w"))).cast("int"))
    val idSets = tok.join(ids, "w").groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("tid"))).as("ids"))
    val joined = docs.join(idSets, "doc_id")
    val both = joined.select(col("doc_id").as("a_id"), col("ws").as("wa"), col("ids").as("ia"))
      .crossJoin(joined.select(col("doc_id").as("b_id"), col("ws").as("wb"), col("ids").as("ib")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("js", GraftSqlBridge.column(JaccardSorted(
        GraftSqlBridge.expression(col("wa")), GraftSqlBridge.expression(col("wb")))))
      .withColumn("ji", GraftSqlBridge.column(JaccardSorted(
        GraftSqlBridge.expression(col("ia")), GraftSqlBridge.expression(col("ib")))))
      .select("js", "ji").collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("intersect_size_sorted equals array_intersect size on both element types") {
    import spark.implicits._
    // string arrays over the real corpus
    val docs = graft.operators.Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), array_sort(array_distinct(split(lower(col("text")), " "))).as("ws"))
      .limit(40)
    val pairs = docs.select(col("doc_id").as("a"), col("ws").as("wa"))
      .crossJoin(docs.select(col("doc_id").as("b"), col("ws").as("wb")))
      .filter(col("a") < col("b"))
    def inter(la: String, lb: String) = GraftSqlBridge.column(IntersectSizeSorted(
      GraftSqlBridge.expression(col(la)), GraftSqlBridge.expression(col(lb))))
    val viaNative = pairs.withColumn("i", inter("wa", "wb"))
      .select("a", "b", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(x => (x._1, x._2))
    val viaSql = pairs.withColumn("i", expr("size(array_intersect(wa, wb))"))
      .select("a", "b", "i").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(x => (x._1, x._2))
    assert(viaNative.length == viaSql.length && viaNative.nonEmpty)
    viaNative.zip(viaSql).foreach { case (x, y) => assert(x == y) }
    // int arrays incl. edge shapes: identical, disjoint, empty,
    // single-overlap, negative ids
    val intCases = Seq(
      (Array(1, 2, 3), Array(1, 2, 3), 3),
      (Array(1, 2, 3), Array(4, 5, 6), 0),
      (Array.empty[Int], Array(1, 2), 0),
      (Array(-5, 0, 7), Array(-5, 8), 1),
      (Array(2), Array(1, 2, 3), 1))
    val idf = intCases.zipWithIndex
      .map { case ((a, b, e), i) => (i, a.toSeq, b.toSeq, e) }
      .toDF("id", "ia", "ib", "expect")
    idf.withColumn("i", inter("ia", "ib")).collect().foreach { r =>
      assert(r.getAs[Int]("i") == r.getAs[Int]("expect"), s"case ${r.getAs[Int]("id")}")
    }
  }

  test("intersect_size_sorted is SQL-callable after registration") {
    val r = spark.sql(
      "SELECT intersect_size_sorted(array(1, 3, 5), array(3, 4, 5)) AS i")
      .collect()(0).getInt(0)
    assert(r == 2)
  }

  test("jaccard_sorted rejects mixed array<int>/array<string> arguments") {
    import spark.implicits._
    val df = Seq((Seq(1, 2), Seq("a", "b"))).toDF("a", "b")
    val e = intercept[Exception] {
      df.withColumn("j", GraftSqlBridge.column(JaccardSorted(
        GraftSqlBridge.expression(col("a")), GraftSqlBridge.expression(col("b")))))
        .collect()
    }
    assert(e.getMessage.contains("jaccard_sorted") || e.getMessage.contains("DATATYPE"))
  }

  test("confluent_schema_id extracts CP1 ids and nulls bad frames") {
    import spark.implicits._
    GraftSqlBridge.registerFunctions(spark)
    val good = graft.avro.ConfluentFraming.frame(123456, Array[Byte](1, 2, 3))
    val badMagic = good.clone(); badMagic(0) = 1
    val truncated = good.take(3)
    val df = Seq(
      (1L, good), (2L, badMagic), (3L, truncated)
    ).toDF("id", "value")
    val out = df.selectExpr("id", "confluent_schema_id(value) AS sid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(out == Map(1L -> 123456, 2L -> null, 3L -> null))
  }

  test("cosine_sim validates input types and handles array<double>") {
    GraftSqlBridge.registerFunctions(spark)
    // array<double> literals (the SQL default) now take the getDouble path
    val v = spark.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    // mixed float/double input is an analysis error, not silent garbage
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0D), array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_sim"))
  }
}
