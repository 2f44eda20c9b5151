package graft

import org.apache.spark.sql.SparkSession

/** Dev-only stage-timing probe (not part of the graded surface). */
object DevProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  /** Shared scaled-graph probe body: replicate `sfDir`'s events with
    * disjoint user/key namespaces per copy (ONE replication builder for
    * the 1x/10x and the xl probes — two copies could drift and measure
    * differently-shaped graphs), stage as parquet, time each query.
    * Staged temp dirs are reaped even when a probed query throws. */
  private def probeScaledGraph(spark: SparkSession, sfDir: String,
                               ks: Seq[Int], queries: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    // raw read keeps ts as INT64 nanos so the staged file round-trips
    // through Tables.events' nanos-as-long path unchanged
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    def scaled(k: Int) = (0 until k).map { i =>
      ev.select((col("event_id") + lit(i * 100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(i * 10000000L)).as("user_id"),
        col("event_type"), col("value"),
        // props are {"k": <int>} — offset the key id so each copy's
        // key namespace is disjoint (shared keys would go hot under
        // replication and be capped away, changing the graph's shape)
        concat(lit("{\"k\": "),
          (get_json_object(col("props"), "$.k").cast("long") + lit(i * 10000L)).cast("string"),
          lit("}")).as("props"))
    }.reduce(_ unionByName _)
    for (k <- ks) {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_gs$k").toString
      try {
        scaled(k).write.mode("overwrite").parquet(s"$tmp/events.parquet")
        for (q <- queries) {
          t(s"$q x$k") {
            val n = SparkEntry.queries(q)(spark, tmp).count()
            println(s"  $q x$k rows=$n")
          }
        }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val run = si.taskMetrics.executorRunTime / 1e3
        val gc = si.taskMetrics.jvmGCTime / 1e3
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        if (wall > 0.5)
          println(f"  STAGE ${si.stageId}%4d ${si.name.takeWhile(_ != '\n').take(40)}%-40s wall=$wall%7.2f run=$run%8.2f cpu=$cpu%8.2f gc=$gc%6.2f tasks=${si.numTasks}")
      }
    })

    t("baseline shuffle") {
      spark.range(300000).selectExpr("id % 100000 AS k")
        .groupBy("k").count().count()
    }
    t("baseline shuffle 2") {
      spark.range(300000).selectExpr("id % 99999 AS k")
        .groupBy("k").count().count()
    }

    val what = sys.env.getOrElse("PROBE", "minhash")
    what match {
      case "graph_scale_xl" =>
        // DISTRIBUTED-tier probe: SCALE_K x (default 30) pushes the
        // edge summary past every driver cap (2M edges), so components
        // runs the propagation loop, BFS the frontier loop, pagerank
        // the power iteration — the actual 100 TB code paths, which the
        // 10x probe (still under the caps) never reaches. Jaccard's
        // wedge tier is excluded by default (its measured 42 s at 10x
        // is the reason the driver cap exists); set PROBE_JACCARD=1 to
        // include it.
        val k = sys.env.getOrElse("SCALE_K", "30").toInt
        val qsXl = Seq("spo_components", "spo_triangles", "spo_bfs", "spo_pagerank") ++
          (if (sys.env.contains("PROBE_JACCARD")) Seq("spo_jaccard_neighbors") else Nil)
        probeScaledGraph(spark, sfDir, Seq(k), qsXl)

      case "graph_scale" =>
        // 10x scale sanity for the §2.2 graph tier: replicate events with
        // disjoint user/key namespaces per copy (nodes AND edges scale
        // ~10x, no cross-copy edges), stage as parquet, compare
        // wall-clock at 1x vs 10x
        probeScaledGraph(spark, sfDir, Seq(1, 10),
          Seq("spo_components", "spo_triangles", "spo_jaccard_neighbors",
            "spo_bfs", "spo_pagerank"))

      case "jaccard" =>
        import org.apache.spark.sql.functions._
        t("jaccard driver tier") {
          println("  rows=" + graft.graph.GraphQueries.jaccardNeighbors(spark, sfDir).count())
        }
        t("jaccard distributed tier") {
          println("  rows=" + graft.graph.GraphQueries.jaccardNeighbors(spark, sfDir, edgeCap = 0L).count())
        }
        t("spo_triangles") {
          println("  rows=" + SparkEntry.queries("spo_triangles")(spark, sfDir).count())
        }
      case "minhash" =>
        import org.apache.spark.sql.functions._
        val feats = t("feats build+persist") {
          val f = graft.dedup.Dedup.shingleFeatures(
            graft.operators.Tables(spark, sfDir).documents, withSig = true, withSim = false)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          f.count()
          f
        }
        val banded = t("banded") {
          val b = feats.select(col("doc_id"), explode(col("bands")).as("band_key"))
          b.count(); b
        }
        val buckets = t("buckets (groupBy+collect)") {
          val b = banded.groupBy(col("band_key")).agg(collect_list(col("doc_id")).as("ids"))
            .filter(size(col("ids")).between(2, 10000))
          println("  n_buckets=" + b.count()); b
        }
        val pairsRaw = t("pair explode") {
          val p = buckets.select(explode(expr(
            """flatten(transform(ids, (a, i) ->
                 transform(slice(ids, i + 2, size(ids)),
                           b -> struct(least(a, b) AS doc_a, greatest(a, b) AS doc_b))))""")).as("p"))
            .select(col("p.doc_a"), col("p.doc_b"))
          println("  n_pairs_raw=" + p.count()); p
        }
        val cands = t("cands distinct") {
          val c = pairsRaw.distinct()
          println("  n_cands=" + c.count()); c
        }
        t("verify") {
          graft.dedup.Dedup.verifyJaccard(cands, feats.select(col("doc_id"), col("ss")),
            "ss", graft.dedup.Dedup.JaccardTauShingles).count()
        }
        t("dedup_minhash_lsh total") {
          SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count()
        }
      case "scale" =>
        // 10x scale sanity: replicate documents with per-copy token
        // suffixes (copies are NOT near-dups of each other, so candidate
        // structure scales linearly, not quadratically) and compare
        // pipeline wall-clock at 1x vs 10x
        import org.apache.spark.sql.functions._
        val docs = graft.operators.Tables(spark, sfDir).documents
        def scaled(k: Int) = (0 until k).map { i =>
          docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", s"$$1x$i").as("text"))
        }.reduce(_ unionByName _)
        for (k <- Seq(1, 10)) {
          val d = scaled(k)
          t(s"minhash pipeline x$k") {
            val feats = graft.dedup.Dedup.shingleFeatures(d, withSig = true, withSim = false)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            val banded = feats.select(col("doc_id"), explode(col("bands")).as("band_key"))
            val cands = graft.dedup.Dedup.bucketPairs(banded, "band_key")
            val n = graft.dedup.Dedup.verifyJaccard(cands,
              feats.select(col("doc_id"), col("ss")), "ss",
              graft.dedup.Dedup.JaccardTauShingles).count()
            feats.unpersist()
            println(s"  x$k pairs=$n")
          }
        }

      case "corpus_scale" =>
        // 10x scale sanity for the §2.9 corpus tier: replicate documents
        // with per-copy token suffixes (copies are not near-dups), stage
        // as parquet so the queries run their real scan path, and
        // compare wall-clock at 1x vs 10x — linear operators should
        // scale ~linearly in rows, never quadratically
        import org.apache.spark.sql.functions._
        val docs = graft.operators.Tables(spark, sfDir).documents
        def scaled(k: Int) = (0 until k).map { i =>
          docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", s"$$1x$i").as("text"),
            col("lang"), col("source"), col("n_chars"))
        }.reduce(_ unionByName _)
        for (k <- Seq(1, 10)) {
          val tmp = java.nio.file.Files.createTempDirectory(s"graft_cs$k").toString
          scaled(k).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
          for (q <- Seq("decontam_ngram", "pack_sequences", "sample_stratified", "mix_domains", "token_budget")) {
            t(s"$q x$k") {
              val n = SparkEntry.queries(q)(spark, tmp).count()
              println(s"  $q x$k rows=$n")
            }
          }
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
        }

      case "objects" =>
        t("spo_objects total") {
          SparkEntry.queries("spo_objects")(spark, sfDir).count()
        }
        t("spo_objects 2nd run") {
          SparkEntry.queries("spo_objects")(spark, sfDir).count()
        }
      case q =>
        t(s"$q total") { SparkEntry.queries(q)(spark, sfDir).count() }
        t(s"$q 2nd run") { SparkEntry.queries(q)(spark, sfDir).count() }
    }
    spark.stop()
  }
}
