package graft.graph

/** Array-backed union-find with path halving — the ONE shared
  * implementation behind every driver-tier connectivity solve
  * (`Components.autoLabel`, the dedup mask tier). Union is
  * min-index-rooted, so the forest shape is deterministic regardless of
  * edge order; relabeling policy (min doc id, min rep, ...) stays with
  * each caller.
  */
private[graft] final class UnionFind(n: Int) {
  private val parent = Array.tabulate(n)(identity)

  def find(x0: Int): Int = {
    var x = x0
    while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
    x
  }

  /** Merge the components of `a` and `b`; returns true if they were
    * previously distinct. */
  def union(a: Int, b: Int): Boolean = {
    val ra = find(a); val rb = find(b)
    if (ra == rb) false
    else {
      if (ra < rb) parent(rb) = ra else parent(ra) = rb
      true
    }
  }
}
