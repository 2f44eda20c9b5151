package graft.similarity

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF index: build-once/probe-many over parquet, with
  * inverted lists as parquet partitions. Pins (1) exactness when every
  * cell is probed, (2) useful recall on a strict cell subset, (3) the
  * partition-pruned probe plan, (4) deterministic rebuilds. */
class VectorIndexSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private val K = 5
  private val NCells = 8

  private def embeddings = graft.operators.Tables(spark, dir).embeddings

  private def queries = embeddings.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding"))

  /** Exact reference: brute-force cosine top-k, self excluded. */
  private def brute(): Map[(Long, Long), Long] = {
    val q = queries.select(col("query_id"), col("embedding").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    q.crossJoin(embeddings.select(col("vec_id"), col("embedding")))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", VectorOps.cosineNative(col("qe"), col("embedding")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Long]("rk")).toMap
  }

  private def withIndex[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    try {
      VectorIndex.buildIvf(spark, embeddings, tmp, NCells)
      f(tmp)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("probing every cell reproduces brute force exactly") {
    withIndex { idx =>
      val got = VectorIndex.probeIvf(spark, idx, queries, K, nprobe = NCells)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) ->
          r.getAs[Long]("rk")).toMap
      assert(got == brute())
    }
  }

  test("a strict cell subset still recalls a useful fraction") {
    withIndex { idx =>
      val ref = brute().keySet
      val got = VectorIndex.probeIvf(spark, idx, queries, K, nprobe = 3)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
      assert(got.size == ref.size)
      val recall = (got & ref).size.toDouble / ref.size
      assert(recall >= 0.4, s"recall $recall")
    }
  }

  test("the probe scan is partition-pruned to the selected cells") {
    withIndex { idx =>
      val df = VectorIndex.probeIvf(spark, idx, queries, K, nprobe = 2)
      df.count()
      val leaves = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      val scan = leaves.find(_.contains("vectors")).getOrElse(leaves.mkString("\n"))
      assert(scan.contains("PartitionFilters:") && scan.contains("cell"),
        scan.take(800))
    }
  }

  test("MIPS index: exhaustive probe equals exact MIPS bit-for-bit, pruned probe recalls") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mips").toString
    try {
      VectorIndex.buildMips(spark, embeddings, tmp, NCells)
      // exact reference: the knn_mips kernel on the same corpus, keyed
      // and scored identically (dot bits included — the stored augment
      // coordinate must never reach the fold)
      val exact = Similarity.mipsTopK(spark, embeddings)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).toSet
      val exh = VectorIndex.probeMips(spark, tmp, queries, K, nprobe = NCells)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("dot")), r.getAs[Long]("rk"))).toSet
      assert(exh == exact, "exhaustive probeMips diverged from exact MIPS")
      val pruned = VectorIndex.probeMips(spark, tmp, queries, K, nprobe = 3)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
      val exactIds = exact.map(t => (t._1, t._2))
      val recall = (pruned & exactIds).size.toDouble / exactIds.size
      assert(recall >= 0.4, s"MIPS pruned recall $recall")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("a fresh buildIvf leaves ≤1 file per cell, so the first compact is a no-op") {
    // compact()'s no-op heuristic reads ">1 parquet file in a cell" as
    // "appends happened"; a build that skipped the cell repartition
    // would break that from day one and pay a full-corpus rewrite with
    // nothing to fold (ADVICE r13)
    withIndex { idx =>
      val cells = Option(new java.io.File(VectorIndex.vectorsPath(idx)).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      assert(cells.nonEmpty)
      cells.foreach { c =>
        val n = Option(c.listFiles()).getOrElse(Array.empty)
          .count(_.getName.endsWith(".parquet"))
        assert(n <= 1, s"${c.getName} holds $n files straight from build")
      }
      VectorIndex.compact(spark, idx)
      assert(VectorIndex.currentGen(idx) == 0L,
        "compact folded a fresh index (no-op heuristic broken)")
    }
  }

  test("MIPS append re-augments under the frozen M² and exhaustive probe stays exact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mips_app").toString
    try {
      // split so the BUILD half contains the corpus max-norm vector —
      // the frozen M² must bound every later append (the documented
      // growth contract)
      val norms = embeddings
        .withColumn("n2", VectorOps.dot("embedding", "embedding"))
        .select(col("vec_id"), col("n2")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1))
      val maxId = norms.maxBy(t => (t._2, t._1))._1
      val build = embeddings.filter(col("vec_id") % 2 === 0 || col("vec_id") === maxId)
      val extra = embeddings.filter(col("vec_id") % 2 =!= 0 && col("vec_id") =!= maxId)
      VectorIndex.buildMips(spark, build, tmp, NCells)
      val m2 = VectorIndex.loadMipsM2(spark, tmp)
      assert(m2.isDefined, "buildMips must persist M² beside the centroids")
      // append RAW d-dim vectors: the index must re-augment them itself
      VectorIndex.append(spark, extra, tmp)
      // every stored vector — built or appended — is (d+1)-dim
      val dims = spark.read.parquet(VectorIndex.vectorsPath(tmp))
        .select(org.apache.spark.sql.functions.size(col("embedding")).as("d"))
        .distinct().collect().map(_.getInt(0)).toSet
      assert(dims == Set(VectorIndex.loadCentroids(spark, tmp).head.length),
        s"mixed dims in the index: $dims")
      // exhaustive probe over the grown index ≡ exact MIPS on the full
      // corpus, dot bits included (augment coordinate never in the fold)
      val exact = Similarity.mipsTopK(spark, embeddings)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).toSet
      val got = VectorIndex.probeMips(spark, tmp, queries, K, nprobe = NCells)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("dot")), r.getAs[Long]("rk"))).toSet
      assert(got == exact, "appended MIPS index diverged from exact MIPS")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("MIPS append refuses a vector outside the frozen norm bound, loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mips_oob").toString
    try {
      val norms = embeddings
        .withColumn("n2", VectorOps.dot("embedding", "embedding"))
        .select(col("vec_id"), col("n2")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1))
      val maxId = norms.maxBy(t => (t._2, t._1))._1
      // train WITHOUT the max-norm vector, then try to append it: its
      // |x|² exceeds the frozen M², the reduction's validity bound
      VectorIndex.buildMips(spark, embeddings.filter(col("vec_id") =!= maxId),
        tmp, NCells)
      val ex = intercept[Exception] {
        VectorIndex.append(spark, embeddings.filter(col("vec_id") === maxId), tmp)
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("rebuild the index")),
        s"expected the loud MIPS-bound refusal, got: ${ex.getMessage}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("plain-IVF rebuild over a former MIPS directory clears the stale M² marker") {
    // ADVICE r14: without the sweep, the leftover mips_m2 would make
    // every future append mis-dispatch to MIPS augmentation — the
    // appended vectors would be (d+1)-dim in a d-dim index, permanently
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild").toString
    try {
      VectorIndex.buildMips(spark, embeddings, tmp, NCells)
      assert(VectorIndex.loadMipsM2(spark, tmp).isDefined)
      val half = embeddings.filter(col("vec_id") % 2 === 0)
      val rest = embeddings.filter(col("vec_id") % 2 =!= 0)
      VectorIndex.buildIvf(spark, half, tmp, NCells)
      assert(VectorIndex.loadMipsM2(spark, tmp).isEmpty,
        "stale mips_m2 survived a plain-IVF rebuild")
      // append dispatches PLAIN: raw d-dim vectors stored unaugmented
      VectorIndex.append(spark, rest, tmp)
      val d = VectorIndex.loadCentroids(spark, tmp).head.length
      val dims = spark.read.parquet(VectorIndex.vectorsPath(tmp))
        .select(org.apache.spark.sql.functions.size(col("embedding")).as("d"))
        .distinct().collect().map(_.getInt(0)).toSet
      assert(dims == Set(d), s"appended vectors augmented in a plain index: $dims")
      val got = VectorIndex.probeIvf(spark, tmp, queries, K, nprobe = NCells)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) ->
          r.getAs[Long]("rk")).toMap
      assert(got == brute(), "post-rebuild exhaustive probe diverged from brute force")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("rebuilding the index is deterministic") {
    withIndex { a =>
      withIndex { b =>
        val ca = VectorIndex.loadCentroids(spark, a).map(_.toSeq).toSeq
        val cb = VectorIndex.loadCentroids(spark, b).map(_.toSeq).toSeq
        assert(ca == cb)
        def cells(p: String) = spark.read.parquet(VectorIndex.vectorsPath(p))
          .select(col("vec_id"), col("cell")).collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(cells(a) == cells(b))
      }
    }
  }
}
