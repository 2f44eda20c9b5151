package graft.graph

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.functions._

/** SPO graph operator suite (SURVEY.md §2.2) on triples derived from the
  * events table — the Spark surface for the reference's Postgres graph
  * (`src/Database.cpp`: objects / relationships / id-lookup).
  */
object GraphQueries extends QueryModule {

  private val T = TripleStore

  /** Shared oracle CTE prelude: triples + objects + edges. */
  private val prelude =
    s"""WITH triples AS (${T.triplesSql}),
      objs AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY name) AS BIGINT) AS object_id, name,
               'entity' AS object_type, first_seen_us
        FROM (SELECT name, MIN(ts_us) AS first_seen_us FROM (
                SELECT subject AS name, ts_us FROM triples
                UNION ALL
                SELECT object AS name, ts_us FROM triples) u
              GROUP BY name)),
      edges AS (
        SELECT s.object_id AS source_id, d.object_id AS target_id, predicate, COUNT(*) AS n
        FROM triples t
        JOIN objs s ON t.subject = s.name
        JOIN objs d ON t.object = d.name
        GROUP BY s.object_id, d.object_id, predicate)"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "spo_objects",
      (s, dir) => T.objects(T.triplesFromEvents(graft.operators.Tables(s, dir).events))
        .orderBy(col("object_id")),
      Some(s"$prelude SELECT object_id, name, object_type, first_seen_us FROM objs ORDER BY object_id")
    ),

    QueryDef(
      "spo_relationships",
      (s, dir) => {
        val t = T.triplesFromEvents(graft.operators.Tables(s, dir).events)
        T.relationships(t, T.objects(t)).orderBy(col("source_id"), col("target_id"), col("predicate"))
      },
      Some(s"$prelude SELECT source_id, target_id, predicate, n FROM edges ORDER BY source_id, target_id, predicate")
    ),

    QueryDef(
      "spo_degree",
      (s, dir) => {
        val t = T.triplesFromEvents(graft.operators.Tables(s, dir).events)
        val objs = T.objects(t)
        // persisted: the edge list feeds both the out- and in-degree aggs
        val edges = T.relationships(t, objs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = edges.groupBy(col("source_id").as("object_id"))
          .agg(sum(col("n")).as("out_edges"), countDistinct(col("target_id")).as("out_neighbors"))
        val in = edges.groupBy(col("target_id").as("object_id"))
          .agg(sum(col("n")).as("in_edges"), countDistinct(col("source_id")).as("in_neighbors"))
        objs.select(col("object_id"), col("name"))
          .join(out, Seq("object_id"), "left")
          .join(in, Seq("object_id"), "left")
          .select(col("object_id"), col("name"),
            coalesce(col("out_edges"), lit(0L)).as("out_edges"),
            coalesce(col("out_neighbors"), lit(0L)).as("out_neighbors"),
            coalesce(col("in_edges"), lit(0L)).as("in_edges"),
            coalesce(col("in_neighbors"), lit(0L)).as("in_neighbors"))
          .orderBy(col("object_id"))
      },
      Some(s"""$prelude,
        outd AS (SELECT source_id AS object_id, CAST(SUM(n) AS BIGINT) AS out_edges,
                   COUNT(DISTINCT target_id) AS out_neighbors FROM edges GROUP BY source_id),
        ind AS (SELECT target_id AS object_id, CAST(SUM(n) AS BIGINT) AS in_edges,
                   COUNT(DISTINCT source_id) AS in_neighbors FROM edges GROUP BY target_id)
      SELECT o.object_id, o.name,
        COALESCE(out_edges, 0) AS out_edges, COALESCE(out_neighbors, 0) AS out_neighbors,
        COALESCE(in_edges, 0) AS in_edges, COALESCE(in_neighbors, 0) AS in_neighbors
      FROM objs o LEFT JOIN outd ON o.object_id = outd.object_id
      LEFT JOIN ind ON o.object_id = ind.object_id
      ORDER BY o.object_id""")
    ),

    QueryDef(
      "spo_predicate_stats",
      (s, dir) => {
        val t = T.triplesFromEvents(graft.operators.Tables(s, dir).events)
        t.groupBy(col("predicate"))
          .agg(count(lit(1)).as("n_triples"),
            countDistinct(col("subject")).as("n_subjects"),
            countDistinct(col("object")).as("n_objects"))
          .orderBy(col("predicate"))
      },
      Some(s"""WITH triples AS (${T.triplesSql})
      SELECT predicate, COUNT(*) AS n_triples,
        COUNT(DISTINCT subject) AS n_subjects, COUNT(DISTINCT object) AS n_objects
      FROM triples GROUP BY predicate ORDER BY predicate""")
    ),

    QueryDef(
      "spo_two_hop",
      (s, dir) => {
        val t = T.triplesFromEvents(graft.operators.Tables(s, dir).events)
        // persisted: both sides of the self-join scan this distinct set
        val hop = t.select(col("subject"), col("object")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val back = hop.select(col("object"), col("subject").as("peer"))
        hop.join(back, "object")
          .filter(col("subject") =!= col("peer"))
          .groupBy(col("subject"))
          .agg(countDistinct(col("peer")).as("n_two_hop_peers"))
          .orderBy(col("subject"))
      },
      Some(s"""WITH triples AS (${T.triplesSql}),
        hop AS (SELECT DISTINCT subject, object FROM triples)
      SELECT a.subject, COUNT(DISTINCT b.subject) AS n_two_hop_peers
      FROM hop a JOIN hop b ON a.object = b.object AND a.subject <> b.subject
      GROUP BY a.subject ORDER BY a.subject""")
    ),

    QueryDef(
      // connected components over the undirected entity graph — the
      // entity-resolution primitive the reference's people/company/email
      // graph exists for. Pregel-style min-label propagation: each round
      // every entity adopts the smallest component id among itself and
      // its neighbors, converging in O(diameter) rounds; each round is
      // one join + one aggregate (both shuffles on entity id), and the
      // driver only sees the converged/changed COUNT per round. Output:
      // per-entity component id (= min object_id in the component) +
      // component sizes, oracle-checked against a DuckDB recursive CTE.
      // Scale note: O(diameter) rounds is the simple, exact form; a
      // graph with pathological diameter at 100 TB would swap the body
      // for alternating large-star/small-star contraction (O(log n)
      // rounds, same per-round join/agg shape).
      "spo_components",
      (s, dir) => {
        val tQ = System.nanoTime()
        val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        // persisted: the triple stream (with its per-row JSON extraction)
        // feeds both the dictionary build and the edge join
        val t = T.triplesFromEvents(graft.operators.Tables(s, dir).events).persist(lvl)
        // the component loop needs only (id, id) edges and the id
        // dictionary — not first-seen times or per-predicate weights, so
        // it skips the min-ts aggregate and the (s,d,predicate) rollup
        // that the objects/relationships surfaces pay for. Ids still come
        // from the same rank-by-name assignment, so component ids (min
        // object_id) match the oracle's exactly.
        val names = t.select(col("subject").as("name"))
          .unionByName(t.select(col("object").as("name")))
          .distinct()
        val objs = graft.operators.DenseIds.byOrder(names, "object_id", 1L, col("name"))
        val src = objs.select(col("name").as("subject"), col("object_id").as("source_id"))
        val dst = objs.select(col("name").as("object"), col("object_id").as("target_id"))
        // normalize pairs before the distinct (one dedup shuffle over half
        // the rows), then mirror — the union after distinct is shuffle-free
        val halfEdges = t
          .join(broadcast(src), "subject")
          .join(broadcast(dst), "object")
          .filter(col("source_id") =!= col("target_id"))
          .select(least(col("source_id"), col("target_id")).as("src"),
            greatest(col("source_id"), col("target_id")).as("dst"))
          .distinct()
        val undirected = halfEdges
          .unionByName(halfEdges.select(col("dst").as("src"), col("src").as("dst")))
          .persist(lvl)
        var labels = objs.select(col("object_id").as("id"), col("object_id").as("comp")).persist(lvl)
        // materialize the heavy inputs under the session's normal config
        // (AQE picks the scan/join/dedup shapes), then run the loop with
        // AQE off and a label-count-scaled shuffle width: each refinement
        // round moves O(labels) tiny rows, and AQE's stage-by-stage
        // submission + replanning costs more per round than the round's
        // work (measured ~1.2-1.7 s/round on ~2.7k labels; the loop is
        // the one place in the suite where fixed per-job overhead, not
        // data volume, dominates)
        val labelCount = labels.count()
        undirected.count() // materialize the edge dedup under AQE too
        val loopParts = math.max(1L, math.min(
          s.sparkContext.defaultParallelism.toLong, labelCount / 10000L)).toString
        val prevAqe = s.conf.get("spark.sql.adaptive.enabled", "true")
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        val prevWsc = s.conf.get("spark.sql.codegen.wholeStage", "true")
        val prevFactory = s.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
        // Below ~10M labels each round is FIXED-overhead-dominated, and
        // the largest fixed cost is janino: every iteration is a NEW
        // logical plan, so whole-stage codegen recompiles ~4 generated
        // classes per round just to touch a few thousand cached rows
        // (measured ~1.2 s/round codegen'd vs ~0.3 s interpreted at
        // sf0.1). Interpreted execution skips the compiler; at real
        // scale (labels ≥ 10M) the rounds are data-dominated and codegen
        // pays for itself, so it stays on.
        val interpretLoop = labelCount < 10_000_000L
        var prev: org.apache.spark.sql.DataFrame = null
        var changed = 1L
        var rounds = 0
        try {
        s.conf.set("spark.sql.adaptive.enabled", "false")
        s.conf.set("spark.sql.shuffle.partitions", loopParts)
        if (interpretLoop) {
          s.conf.set("spark.sql.codegen.wholeStage", "false")
          s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        }
        // One hop per check, but the check itself is join-free: the old
        // label rides along as a marker column through the min-aggregate,
        // so `changed` is a filter-count over the already-materialized
        // round output instead of a second join (measured: the per-round
        // convergence join was ~40% of each round's wall time). Pointer
        // jumping (comp-of-comp self-join) measured 3x slower at sf0.1;
        // this graph converges in few rounds, and a pathological-diameter
        // graph at scale would swap the body for large-star/small-star
        // contraction (O(log n) rounds, same join/agg shape).
        while (changed > 0 && rounds < 50) {
          val tR0 = System.nanoTime()
          val neighborMin = undirected
            .join(labels, col("src") === col("id"))
            .select(col("dst").as("id"), col("comp"))
          var merged = labels.withColumn("own", lit(true))
            .unionByName(neighborMin.withColumn("own", lit(false)))
            .groupBy(col("id"))
            .agg(min(col("comp")).as("comp"),
              max(when(col("own"), col("comp"))).as("oldc"))
          // persist does NOT truncate the logical plan — without a
          // periodic localCheckpoint, planning cost and DAG size grow
          // linearly with rounds (each round's plan embeds every prior
          // round's)
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
        } finally {
          s.conf.set("spark.sql.adaptive.enabled", prevAqe)
          s.conf.set("spark.sql.shuffle.partitions", prevParts)
          s.conf.set("spark.sql.codegen.wholeStage", prevWsc)
          s.conf.set("spark.sql.codegen.factoryMode", prevFactory)
        }
        // a diameter > 50 graph must fail loudly, not return wrong labels
        require(changed == 0, s"components did not converge in $rounds rounds")
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          System.err.println(s"[cc] loop-done total=${(System.nanoTime() - tQ) / 1e9}")
        val sizes = labels.groupBy(col("comp")).agg(count(lit(1)).as("component_size"))
        labels.join(sizes, "comp")
          .select(col("id").as("object_id"), col("comp").as("component_id"), col("component_size"))
          .orderBy(col("object_id"))
      },
      Some(s"""$prelude,
        undir AS (
          SELECT source_id AS src, target_id AS dst FROM edges
          UNION
          SELECT target_id, source_id FROM edges),
        cc AS (
          WITH RECURSIVE reach(id, comp) AS (
            SELECT object_id, object_id FROM objs
            UNION
            SELECT u.dst, r.comp FROM reach r JOIN undir u ON r.id = u.src)
          SELECT id, MIN(comp) AS component_id FROM reach GROUP BY id),
        sizes AS (SELECT component_id, COUNT(*) AS component_size FROM cc GROUP BY component_id)
      SELECT cc.id AS object_id, cc.component_id, sizes.component_size
      FROM cc JOIN sizes ON cc.component_id = sizes.component_id
      ORDER BY object_id""")
    ),

    QueryDef(
      "spo_cooccurrence",
      (s, dir) => {
        val t = T.triplesFromEvents(graft.operators.Tables(s, dir).events)
        // persisted: both sides of the self-join scan this distinct set
        val so = t.select(col("subject"), col("object")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val b = so.select(col("subject"), col("object").as("object_b"))
        so.join(b, "subject")
          .filter(col("object") < col("object_b"))
          .groupBy(col("object"), col("object_b"))
          .agg(count(lit(1)).as("n_shared_subjects"))
          .filter(col("n_shared_subjects") >= 10)
          .orderBy(col("object"), col("object_b"))
      },
      Some(s"""WITH triples AS (${T.triplesSql}),
        so AS (SELECT DISTINCT subject, object FROM triples)
      SELECT a.object AS object, b.object AS object_b, COUNT(*) AS n_shared_subjects
      FROM so a JOIN so b ON a.subject = b.subject AND a.object < b.object
      GROUP BY a.object, b.object HAVING COUNT(*) >= 10
      ORDER BY object, object_b""")
    )
  )
}
