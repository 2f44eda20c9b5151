package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Degree-ordered triangle counting.
  *
  * The naive three-way edge self-join is Θ(Σ d²) over node degrees — on a
  * power-law graph the hot tail makes that quadratic. The standard bound
  * (node-iterator with degree ordering) orients every undirected edge from
  * its lower-(degree, id) endpoint to its higher one; under that
  * orientation every out-degree is O(√m), so wedge volume is O(m^1.5)
  * worst-case and output-sensitive in practice. Every step is a shuffled
  * equi-join — no cartesian anywhere — and each triangle is enumerated
  * exactly once, at its minimum-key corner, so the per-corner counts match
  * any other consistent total order (the oracle uses plain id order).
  */
object Triangles {

  /** Per-node triangle counts.
    *
    * @param half  canonical undirected edges: columns (a, b) with a < b,
    *              distinct, no self-loops
    * @param nodes column (id) — the full node set (zero-filled in output)
    * @return (id, n_triangles) — one row per node
    */
  def countPerNode(half: DataFrame, nodes: DataFrame): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val h = half.persist(lvl)
    // orientation key = struct(degree, id): degree-major strict total
    // order (ids unique). A struct comparison instead of the previous
    // packed `deg * 2^32 + id` long — the packed form silently stopped
    // being a total order past id 2^32 or degree 2^31 (overflow / id
    // bleeding into degree bits), which would drop or double-count
    // triangles with no error; struct ordering has no range assumption.
    // The key table is node-dictionary-sized — broadcast, like the id
    // dictionary itself.
    val key = h.select(col("a").as("id"))
      .unionByName(h.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .select(col("id"), struct(col("deg"), col("id")).as("k"))
    val oriented = h
      .join(broadcast(key.select(col("id").as("a"), col("k").as("ka"))), "a")
      .join(broadcast(key.select(col("id").as("b"), col("k").as("kb"))), "b")
      .select(
        when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("u"),
        when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("v"),
        greatest(col("ka"), col("kb")).as("kv"))
      .persist(lvl)
    // wedges at each triangle's minimum-key corner u: out-neighbor pairs
    // (v, w) with kv < kw; the closing edge is oriented v → w because
    // edge orientation follows the same key order
    val wedges = oriented.select(col("u"), col("v"), col("kv"))
      .join(oriented.select(col("u"), col("v").as("w"), col("kv").as("kw")), "u")
      .filter(col("kv") < col("kw"))
      .select(col("u"), col("v"), col("w"))
    val tri = wedges
      .join(oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      .persist(lvl)
    val corners = tri.select(col("u").as("id"))
      .unionByName(tri.select(col("v").as("id")))
      .unionByName(tri.select(col("w").as("id")))
    val cnt = corners.groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    nodes.join(cnt, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
