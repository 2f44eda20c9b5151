package graft.similarity

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("knn_lsh scores a strict subset of the corpus yet recalls a useful " +
    "fraction of brute-force top-k") {
    val bf = SparkEntry.queries("knn_bruteforce")(spark, dir)
      .collect().map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id")))).toSet
    val lsh = SparkEntry.queries("knn_lsh")(spark, dir)
      .collect().map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id")))).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    // near-random synthetic vectors are cosine-LSH's worst case; require
    // a floor well above chance (scoring ~25% of corpus at random would
    // give ~0.25)
    assert(recall >= 0.3, s"recall $recall")
  }

  test("knn_ivf probes a cell subset yet recalls a useful fraction of brute force") {
    val bf = SparkEntry.queries("knn_bruteforce")(spark, dir)
      .collect().map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id")))).toSet
    val ivf = SparkEntry.queries("knn_ivf")(spark, dir)
      .collect().map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id")))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    // nprobe/k = 4/16 = 25% of cells probed; random scoring would recall
    // ~0.25 — require clearly better, and determinism across runs
    assert(recall >= 0.3, s"recall $recall")
    val ivf2 = SparkEntry.queries("knn_ivf")(spark, dir)
      .collect().map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id")))).toSet
    assert(ivf == ivf2, "knn_ivf not deterministic")
  }

  test("knn_ivfpq recalls through BOTH approximations and is exact when exhaustive") {
    val bf = SparkEntry.queries("knn_bruteforce")(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id"))))
    val bfSet = bf.toSet
    val ann = SparkEntry.queries("knn_ivfpq")(spark, dir).collect()
    val annSet = ann.map(r =>
      (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id")))).toSet
    // compounded recall (cell pruning x code quantization) still clears
    // the shared floor, and the measured-recall gate column agrees
    val recall = (bfSet & annSet).size.toDouble / bfSet.size
    assert(recall >= 0.3, s"recall $recall")
    ann.headOption.foreach { r =>
      val gate = r.getDouble(r.fieldIndex("recall"))
      assert(math.abs(gate - recall) < 1e-9, s"gate $gate vs measured $recall")
    }
    // determinism
    val ann2 = SparkEntry.queries("knn_ivfpq")(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id")))).toSet
    assert(annSet == ann2, "knn_ivfpq not deterministic")
    // dial both approximations to exhaustive: probe every cell, re-rank
    // a corpus-sized candidate set -> the exact-cosine re-rank must
    // reproduce brute-force top-k EXACTLY (ids, cosines, ranks)
    val exhaustive = Similarity
      .ivfpq(spark, dir, nCells = 16, nProbe = 16, m = 8, kSub = 16, rerank = 1000000)
      .select("qid", "vec_id", "cosine", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val bfFull = SparkEntry.queries("knn_bruteforce")(spark, dir)
      .select("qid", "vec_id", "cosine", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(exhaustive == bfFull, "exhaustive ivfpq != brute force")
  }

  test("knn_pq: ADC distance equals the reconstructed-vector distance exactly") {
    // the ADC identity: summing lut(m)(code(m)) must be the SAME
    // arithmetic as the squared L2 between the query and the DECODED
    // vector accumulated subspace-by-subspace — not approximately, bit
    // for bit, because both run the identical per-subspace loops
    val e = graft.operators.Tables(spark, dir).embeddings
    val vecs = e.select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding"))
    val M = 8
    val books = Similarity.pqCodebooks(spark, vecs, M, 16, iters = 2)
    val sample = vecs.orderBy(org.apache.spark.sql.functions.col("vec_id"))
      .limit(20).collect().map(r => Similarity.normalized(r.getSeq[Float](1)))
    val dims = sample.head.length
    val offs = Similarity.pqOffsets(dims, M)
    val q = sample.head
    val lut = Similarity.adcLut(books, offs, q)
    sample.foreach { v =>
      val code = Similarity.pqEncode(books, offs, v)
      var adc = 0.0
      var mi = 0
      while (mi < M) { adc += lut(mi)(code(mi)); mi += 1 }
      var direct = 0.0
      mi = 0
      while (mi < M) {
        var d = 0.0
        var i = offs(mi)
        while (i < offs(mi + 1)) {
          val t = q(i) - books(mi)(code(mi))(i - offs(mi)); d += t * t; i += 1
        }
        direct += d
        mi += 1
      }
      assert(adc == direct, s"ADC $adc != direct $direct")
    }
    // quantization is lossy but sane: codes reconstruct closer to their
    // own vector than to a different vector's reconstruction on average
    val codes = sample.map(v => Similarity.pqEncode(books, offs, v))
    assert(codes.distinct.length > 1, "degenerate codebooks: all codes equal")
  }

  test("knn_pq recalls a useful fraction of brute force, deterministically") {
    val bf = SparkEntry.queries("knn_bruteforce")(spark, dir)
      .collect().map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id")))).toSet
    val pq = SparkEntry.queries("knn_pq")(spark, dir)
      .collect().map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id")))).toSet
    val recall = (bf & pq).size.toDouble / bf.size
    // 32-candidate re-rank from 8-byte codes over a near-random corpus;
    // random candidate picking would recall ~32/N (~0.3 only at N=100) —
    // require the same floor the other ANN variants carry
    assert(recall >= Similarity.RecallFloor, s"recall $recall")
    val pq2 = SparkEntry.queries("knn_pq")(spark, dir)
      .collect().map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id")))).toSet
    assert(pq == pq2, "knn_pq not deterministic")
  }

  test("knn_radius: complete ball, consistent with top-k, radius respected") {
    val ball = SparkEntry.queries("knn_radius")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(ball.nonEmpty)
    ball.values.foreach(c => assert(c >= 0.25))
    // cross-consistency: every brute-force top-k hit with cosine >= R
    // must be IN the ball with the identical cosine (both sides are
    // exact, so membership and values agree bit-for-bit)
    val bf = SparkEntry.queries("knn_bruteforce")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val inRange = bf.filter(_._2 >= 0.25)
    assert(inRange.nonEmpty, "no top-k hit reaches the radius — cross-check vacuous")
    inRange.foreach { case (k, c) =>
      assert(ball.get(k).contains(c), s"top-k hit $k ($c) missing from ball")
    }
  }

  test("native expression, HOF column, and kernel cosine are bit-identical") {
    import org.apache.spark.sql.functions.col
    val e = graft.operators.Tables(spark, dir).embeddings.limit(100)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ida") < col("idb"))
    val viaHof = pairs.select(col("ida"), col("idb"),
      VectorOps.cosine("ea", "eb").as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaNative = pairs.select(col("ida"), col("idb"),
      VectorOps.cosineNative(col("ea"), col("eb")).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaKernel = VectorOps.cosineKernel(pairs, "ea", "eb")
      .select(col("ida"), col("idb"), col("cosine")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaHof.nonEmpty)
    assert(viaHof == viaNative) // exact double equality
    assert(viaHof == viaKernel)
  }

  test("cosine_sim is SQL-callable after registration") {
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    val v = spark.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").collect().head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("vector ops are exact on knowns") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))), schema)
    val r = df.select(
      VectorOps.dot("a", "b").as("dot"),
      VectorOps.norm("a").as("na"),
      VectorOps.cosine("a", "b").as("cos")).collect().head
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("knn_mips kernel equals driver brute force on the shipped corpus") {
    val vecs = graft.operators.Tables(spark, dir).embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val got = graft.SparkEntry.queries("knn_mips")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val want = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, dot(vecs(qid), v)) }
        .sortBy { case (id, d) => (-d, id) }.take(rows.length)
      assert(rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq == want,
        s"qid=$qid kernel diverges from driver brute force")
    }
  }

  test("MIPS != cosine on varied norms, and norm-augmentation reduces MIPS to cosine") {
    // the shipped embeddings are unit-norm (MIPS ≡ cosine there by
    // construction), so the objectives are separated on ENGINEERED
    // vectors through the real query body: a big-magnitude vector
    // moderately aligned with the query must top MIPS by sheer norm
    // while cosine prefers the small perfectly-aligned one
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def unit(i: Int, d: Int, scale: Float): Array[Float] =
      Array.tabulate(d)(j => if (j == i) scale else 0.0f)
    val d = 4
    // qid 0 points along axis 0; vec 100 is axis-0-aligned but tiny,
    // vec 101 is half-aligned (axis 0 + axis 1) with huge norm
    val corpus = Seq(
      0L -> unit(0, d, 1.0f),
      100L -> unit(0, d, 0.5f),
      101L -> Array(10.0f, 10.0f, 0.0f, 0.0f),
      102L -> unit(1, d, 0.4f),
      103L -> unit(2, d, 0.3f),
      104L -> unit(3, d, 0.2f),
      105L -> Array(0.1f, 0.1f, 0.1f, 0.1f)
    ).toDF("vec_id", "embedding")
    val got = Similarity.mipsTopK(spark, corpus)
      .filter(col("qid") === 0L).orderBy(col("rk")).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    // MIPS order from exact driver math: 101 (dot 10) > 100 (0.5) > ...
    assert(got.head == ((101L, 10.0)), s"MIPS must rank the big vector first, got ${got.toSeq}")
    assert(got(1) == ((100L, 0.5)))
    // cosine would rank 100 (cos 1.0) above 101 (cos ~0.707): objectives differ
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def ddot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Double], b: Array[Double]): Double =
      ddot(a, b) / (math.sqrt(ddot(a, a)) * math.sqrt(ddot(b, b)))
    assert(cos(vecs(0L), vecs(100L)) > cos(vecs(0L), vecs(101L)),
      "engineered data does not separate the objectives")
    // the 100 TB serving path: x' = [x, sqrt(M^2 - |x|^2)], q' = [q, 0]
    // gives cos(q', x') = dot(q, x) / (|q| * M) — monotone in dot, so
    // the augmented-cosine order IS the MIPS order and the existing
    // cosine ANN tiers serve MIPS unchanged. Exact on the varied-norm
    // engineered corpus (an identity, not an approximation).
    val m2 = vecs.values.map(v => ddot(v, v)).max
    val aug = vecs.map { case (id, v) => id -> (v :+ math.sqrt(math.max(0.0, m2 - ddot(v, v)))) }
    val q = vecs(0L); val qAug = q :+ 0.0
    val mips = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, ddot(q, v)) }
      .sortBy { case (id, x) => (-x, id) }.map(_._1)
    val cosAug = aug.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(qAug, v)) }
      .sortBy { case (id, c) => (-c, id) }.map(_._1)
    assert(mips == cosAug, s"augmentation order $cosAug diverged from MIPS order $mips")
  }

  test("dot_product native is bit-identical to the HOF fold and blind to the augment coordinate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, array, lit}
    val df = Seq(
      (1L, Array(0.1f, -0.2f, 0.3f), Array(0.4f, 0.5f, -0.6f)),
      (2L, Array(1.5f, 2.5f, -3.5f), Array(-0.25f, 0.125f, 4.0f))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorOps.dotNative(col("a"), col("b")).as("native"),
        VectorOps.dot("a", "b").as("hof"),
        // augmented right side: one extra coordinate the shorter left
        // array never reaches — the knn_mips_ann scoring identity
        VectorOps.dotNative(col("a"),
          org.apache.spark.sql.functions.concat(col("b"), array(lit(9.9f)))).as("aug"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"native != HOF for id=${r.getLong(0)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), s"augment coordinate leaked for id=${r.getLong(0)}")
    }
    spark.sql("SELECT dot_product(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .collect().foreach(r => assert(r.getDouble(0) == 2.0))
  }

  test("knn_mips_ann is exact MIPS when probing is exhaustive, and recalls through a strict subset") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def top(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
      df.orderBy(col("qid"), col("rk")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).toSeq
    // shipped corpus: exhaustive probing ≡ the exact one-pass kernel,
    // ids AND dot bits (the augment coordinate never enters the fold)
    val e = graft.operators.Tables(spark, "/root/testdata/sf0.001").embeddings
    val exact = top(Similarity.mipsTopK(spark, e))
    assert(exact.nonEmpty)
    assert(top(Similarity.mipsAnn(spark, e, nCells = 4, nProbe = 4)) == exact,
      "exhaustive mipsAnn diverged from exact MIPS on the shipped corpus")
    // varied-norm corpus (the regime where MIPS ≠ cosine): same identity
    val corpus = Seq(
      0L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      100L -> Array(0.5f, 0.0f, 0.0f, 0.0f),
      101L -> Array(10.0f, 10.0f, 0.0f, 0.0f),
      102L -> Array(0.0f, 0.4f, 0.0f, 0.0f),
      103L -> Array(0.0f, 0.0f, 0.3f, 0.0f),
      104L -> Array(0.0f, 0.0f, 0.0f, 0.2f),
      105L -> Array(0.1f, 0.1f, 0.1f, 0.1f)
    ).toDF("vec_id", "embedding")
    val exactV = top(Similarity.mipsTopK(spark, corpus))
    assert(top(Similarity.mipsAnn(spark, corpus, nCells = 2, nProbe = 2)) == exactV,
      "exhaustive mipsAnn diverged from exact MIPS on the varied-norm corpus")
    // strict-subset probing on the shipped corpus: the serving
    // configuration must clear the shared recall floor vs exact MIPS
    val sub = Similarity.mipsAnn(spark, e, nCells = 16, nProbe = 4)
      .select(col("qid"), col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactIds = exact.map(t => (t._1, t._2))
    val recall = exactIds.count(sub.contains).toDouble / exactIds.size
    assert(recall >= Similarity.RecallFloor,
      s"mips ANN recall $recall under floor ${Similarity.RecallFloor}")
  }

  test("knn_mips_ivfpq is exact MIPS when both approximations are exhaustive, and recalls compressed") {
    import org.apache.spark.sql.functions.col
    def top(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
      df.orderBy(col("qid"), col("rk")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).toSeq
    val e = graft.operators.Tables(spark, "/root/testdata/sf0.001").embeddings
    val n = e.count().toInt
    val exact = top(Similarity.mipsTopK(spark, e))
    assert(exact.nonEmpty)
    // both approximations dialed to exhaustive: every cell probed, every
    // probed row a re-rank candidate -> the 8-byte codes decide nothing
    // and the exact-dot re-rank IS the exact answer, bit for bit
    val exh = top(Similarity.mipsIvfPq(spark, e,
      nCells = 4, nProbe = 4, m = 8, kSub = 16, rerank = n))
    assert(exh == exact, "exhaustive mips IVF+PQ diverged from exact MIPS")
    // the serving configuration (pruned + compressed) clears the floor
    val sub = Similarity.mipsIvfPq(spark, e,
        nCells = 16, nProbe = 4, m = 8, kSub = 16, rerank = 32)
      .select(col("qid"), col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactIds = exact.map(t => (t._1, t._2))
    val recall = exactIds.count(sub.contains).toDouble / exactIds.size
    assert(recall >= Similarity.RecallFloor,
      s"mips IVF+PQ recall $recall under floor ${Similarity.RecallFloor}")
  }
}
