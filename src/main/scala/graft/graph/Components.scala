package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation, shared by the SPO
  * graph surface (`spo_components`) and the dedup cluster surface
  * (`dedup_clusters`).
  *
  * Each node starts labeled with its own id and repeatedly takes the
  * minimum label among itself and its neighbors, converging in
  * O(diameter) rounds; each round is one join + one aggregate (both
  * shuffles on node id), and the driver only sees the changed COUNT per
  * round. A graph whose diameter exhausts the round budget falls back
  * automatically to alternating large-star/small-star contraction
  * ([[starContraction]]: O(log n) rounds, same per-round join/agg
  * shape), so pathological diameters converge instead of failing.
  *
  * Loop regime (measured, see SURVEY §6): inputs are materialized under
  * the session's normal config (AQE picks the scan/join/dedup shapes),
  * then the loop runs with
  *  - AQE off and a label-count-scaled shuffle width — each refinement
  *    round moves O(labels) tiny rows, and AQE's stage-by-stage
  *    submission + replanning costs more per round than the round's
  *    work (~1.2-1.7 s/round on ~2.7k labels);
  *  - interpreted execution below ~10M labels — every iteration is a
  *    NEW logical plan, so whole-stage codegen recompiles ~4 generated
  *    classes per round just to touch a few thousand cached rows
  *    (~1.2 s/round codegen'd vs ~0.3 s interpreted at sf0.1); at
  *    data-dominated scale codegen pays for itself and stays on;
  *  - a join-free convergence check — the old label rides through the
  *    min-aggregate as a marker column, so `changed` is a filter-count
  *    over the already-materialized round output (the convergence join
  *    it replaces was ~40% of each round);
  *  - periodic `localCheckpoint` — persist does NOT truncate the
  *    logical plan, so without it planning cost grows linearly with
  *    rounds.
  *
  * Measured dead ends (A/B on sf0.1, do not re-attempt without new
  * evidence): batching 2 hops per convergence check (+ disabling the
  * loop's broadcast joins) was ~25-30% SLOWER than one hop per check —
  * the deeper per-action plan costs more than the saved job overhead;
  * pointer jumping (comp-of-comp self-join) measured 3x slower.
  */
object Components {

  /** @param undirected symmetric (src, dst) edge list — both directions
    *                    present; will be persisted and materialized here
    *                    if the caller has not already done so
    * @param nodes       (id) node dictionary; labels start as id
    * @return            (id, comp) with comp = min node id reachable
    */
  def labelPropagation(s: SparkSession, undirected: DataFrame, nodes: DataFrame,
                       maxRounds: Int = 50): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // localCheckpoint, not persist: persist caches the DATA but every
    // round still re-analyzes a logical plan embedding the caller's full
    // upstream pipeline (for dedup_clusters that plan is the whole
    // two-tier ngram join — measured ~1-3 s/round of pure driver-side
    // analysis). Checkpointing truncates the plan to the materialized
    // blocks once, before the loop. (Executor-local, not fault-tolerant:
    // acceptable for an iterative scratch dataset — a lost executor
    // restarts the query, not silent corruption.)
    val t0 = System.nanoTime()
    val edges = undirected.localCheckpoint()
    val t1 = System.nanoTime()
    var labels = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    val t2 = System.nanoTime()
    val labelCount = labels.count()
    val edgeCount = edges.count()
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[cc] setup labels=$labelCount edges=$edgeCount edge_ckpt_sec=${(t1 - t0) / 1e9} label_ckpt_sec=${(t2 - t1) / 1e9}")
    // the loop regime is sized by the LARGER side: a dense pair graph
    // (dedup_clusters: ~100x more edges than nodes) is edge-bound even
    // when the label set is tiny
    val workRows = math.max(labelCount, edgeCount)
    val loopParts = math.max(1L, math.min(
      s.sparkContext.defaultParallelism.toLong, workRows / 10000L)).toString
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled", "true")
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    val prevWsc = s.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFactory = s.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val interpretLoop = workRows < 10_000_000L
    var prev: DataFrame = null
    var changed = 1L
    var rounds = 0
    try {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.shuffle.partitions", loopParts)
      if (interpretLoop) {
        s.conf.set("spark.sql.codegen.wholeStage", "false")
        s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      }
      while (changed > 0 && rounds < maxRounds) {
        val tR0 = System.nanoTime()
        val neighborMin = edges
          .join(labels, col("src") === col("id"))
          .select(col("dst").as("id"), col("comp"))
        var merged = labels.withColumn("own", lit(true))
          .unionByName(neighborMin.withColumn("own", lit(false)))
          .groupBy(col("id"))
          .agg(min(col("comp")).as("comp"),
            max(when(col("own"), col("comp"))).as("oldc"))
        merged =
          if (rounds % 6 == 5) merged.localCheckpoint()
          else merged.persist(lvl)
        val tR = System.nanoTime()
        changed = merged.filter(col("comp") =!= col("oldc")).count()
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          System.err.println(s"[cc] round=$rounds changed=$changed count_sec=${(System.nanoTime() - tR) / 1e9} round_sec=${(System.nanoTime() - tR0) / 1e9}")
        if (prev != null) prev.unpersist()
        prev = merged
        labels = merged.select(col("id"), col("comp"))
        rounds += 1
      }
      if (changed > 0) {
        // round budget exhausted: the graph's diameter exceeds what
        // O(diameter) propagation should be asked to walk (a path-shaped
        // pathology at scale). Switch to alternating large-star/
        // small-star contraction — O(log n) rounds regardless of
        // diameter, same per-round join/agg shuffle shape — rather than
        // fail or, worse, return partial labels.
        labels = starContraction(s, edges, nodes)
      }
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.conf.set("spark.sql.codegen.wholeStage", prevWsc)
      s.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
    labels
  }

  /** Connected components with an automatic driver tier: when the edge
    * list fits comfortably on the driver (`driverCap` rows — the same
    * already-broadcast-sized argument as the dedup mask tier), solve
    * with a local union-find in one collect + one createDataFrame
    * instead of an iterative loop of Spark jobs. The dedup_clusters
    * postmortem is the rationale: on small-to-medium summaries the
    * propagation loop's fixed per-round job overhead dominates actual
    * work by 10x. Larger graphs fall through to [[labelPropagation]]
    * (which itself falls back to star contraction on high diameter).
    *
    * @param undirected symmetric (src, dst) long-id edge list
    * @param nodes      (id) node dictionary
    * @return           (id, comp), comp = min reachable node id
    */
  def autoLabel(s: SparkSession, undirected: DataFrame, nodes: DataFrame,
                driverCap: Long = 2000000L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = undirected.select(col("src").cast("long"), col("dst").cast("long"))
      .persist(lvl)
    if (edges.count() > driverCap) {
      val out = labelPropagation(s, edges, nodes)
      edges.unpersist()
      return out
    }
    val endpointLabels = driverSolve(s, edges)
    edges.unpersist()
    // contract check without collecting nodes: an edge endpoint absent
    // from `nodes` is malformed input — the propagation loop would
    // half-bridge through it (it relays but its gain never counts as
    // `changed`, so closure silently stops early); fail loudly instead
    // of picking either wrong answer. Anti-join is endpoint-sized.
    val unknown = endpointLabels.select(col("id"))
      .join(nodes.select(col("id").cast("long").as("id")), Seq("id"), "left_anti")
      .limit(1).collect()
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"edge endpoint not in nodes: ${unknown.head.getLong(0)}")
    // isolated nodes (no incident edge) label themselves distributively —
    // the nodes frame is never collected
    val isolated = nodes.select(col("id").cast("long").as("id"))
      .join(broadcast(endpointLabels.select(col("id"))), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    endpointLabels.unionByName(isolated)
  }

  /** [[autoLabel]] for the common case where the node set IS the edge
    * endpoint set (e.g. a pair graph where every node comes from a
    * pair): skips the membership check and the isolated-node union,
    * whose anti-joins would re-run the caller's whole edge-generation
    * plan when it isn't persisted. */
  def autoLabelEndpoints(s: SparkSession, undirected: DataFrame,
                         driverCap: Long = 2000000L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = undirected.select(col("src").cast("long"), col("dst").cast("long"))
      .persist(lvl)
    if (edges.count() > driverCap) {
      val out = labelPropagation(s, edges, edges.select(col("src").as("id")).distinct())
      edges.unpersist()
      return out
    }
    val out = driverSolve(s, edges)
    edges.unpersist()
    out
  }

  /** Driver union-find over a collected (already cap-checked) edge
    * list: labels for every EDGE ENDPOINT (<= 2x the cap by
    * construction) — the node dictionary is never collected. */
  private def driverSolve(s: SparkSession, edges: DataFrame): DataFrame = {
    val pairs = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toArray.distinct
    val idx = ids.zipWithIndex.toMap
    val uf = new UnionFind(ids.length)
    pairs.foreach { case (a, b) => uf.union(idx(a), idx(b)) }
    // component label = min node ID (not min index): index order is
    // collect order, which need not be id order
    val minId = Array.fill(ids.length)(Long.MaxValue)
    for (i <- ids.indices) {
      val r = uf.find(i)
      if (ids(i) < minId(r)) minId(r) = ids(i)
    }
    import s.implicits._
    ids.indices.map(i => (ids(i), minId(uf.find(i)))).toDF("id", "comp")
  }

  /** Connected components by alternating large-star/small-star
    * contraction (the MapReduce-era O(log n)-round algorithm): edges are
    * kept canonical (big id -> small id, distinct);
    *
    *  - large-star: every node connects its LARGER neighbors to its
    *    minimum neighborhood member m(u) = min(N(u) + u);
    *  - small-star: every node connects itself and its smaller
    *    neighbors to their minimum.
    *
    * The fixpoint is one star per component centered at the component
    * minimum, so labels read directly off the final edge set. Each
    * round is two (groupBy + join) shuffles on node id — the same
    * shape as a propagation round — but the round COUNT is logarithmic
    * in component size instead of linear in diameter.
    *
    * Used as [[labelPropagation]]'s high-diameter fallback and directly
    * spec-testable; `maxIters` = 60 can only trip on a bug (2^60 nodes
    * would converge within it), and trips loudly.
    */
  private[graph] def starContraction(s: SparkSession, symEdges: DataFrame,
                                     nodes: DataFrame, maxIters: Int = 60): DataFrame = {
    var e = symEdges.filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .distinct().localCheckpoint()
    var iters = 0
    var done = e.isEmpty
    while (!done && iters < maxIters) {
      val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val lmins = sym.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      val large = sym.join(lmins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val smins = large.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val small = large.join(smins, "src")
      val e2 = small.select(col("src"), col("m").as("dst"))
        .unionByName(small.filter(col("dst") =!= col("m"))
          .select(col("dst").as("src"), col("m").as("dst")))
        .distinct().localCheckpoint()
      // fixpoint = per-component stars; both sets are distinct, so
      // equal count + empty one-sided difference means set equality
      done = e2.count() == e.count() && e2.except(e).isEmpty
      e = e2
      iters += 1
    }
    require(done, s"star contraction did not converge in $maxIters rounds")
    nodes.select(col("id"))
      .join(e.select(col("src").as("id"), col("dst").as("comp")), Seq("id"), "left")
      // at the fixpoint every non-center node has exactly one star edge;
      // the min() is schema-level insurance, not load-bearing
      .groupBy(col("id"))
      .agg(min(col("comp")).as("mc"))
      .select(col("id"), coalesce(col("mc"), col("id")).as("comp"))
  }
}
