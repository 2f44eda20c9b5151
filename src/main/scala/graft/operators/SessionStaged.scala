package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-scoped staged-artifact cache — THE keying discipline for the
  * staging tier (graph artifacts, dedup features, blocking assignments),
  * extracted once so the three users cannot diverge.
  *
  * Keys are (session REFERENCE, dataset dir): SparkSession uses identity
  * equality, so two live sessions can never collide (an
  * identityHashCode-string key could), and a restarted session rebuilds
  * rather than seeing persisted blocks of a stopped one. Entries are
  * held strongly and never auto-evicted — bounded by the (session,
  * dataset) pairs a process actually touches, which is one for the
  * gate/bench drivers. A long-lived multi-session host calls [[clear]]
  * between sessions; Spark drops a stopped session's persisted blocks
  * with its executors either way, so stale entries cost driver-side
  * plan objects, not cluster memory.
  */
final class SessionStaged[A](build: (SparkSession, String) => A,
                             teardown: A => Unit = (_: A) => ()) {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), A]

  // register LAST: publishing `this` before `cache` is assigned would
  // let a concurrent evictAll/clearAll sweep reach a
  // partially-constructed instance and NPE on the null map
  SessionStaged.register(this)

  def get(s: SparkSession, dir: String): A =
    cache.computeIfAbsent((s, dir), k => build(k._1, k._2))

  /** Drop ONE (session, dataset) entry, tearing it down (unpersist) if
    * present. For hosts that sweep many datasets through one session —
    * a scale probe staging N temp dirs would otherwise accumulate N
    * persisted feature sets and tax every later measurement's heap. */
  def evict(s: SparkSession, dir: String): Unit = {
    val v = cache.remove((s, dir))
    if (v != null) {
      try teardown(v)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Drop every entry (multi-session hosts, tests), running `teardown`
    * on each value first — users pass an unpersist so a LIVE session's
    * cached blocks are actually released rather than orphaned in its
    * CacheManager (a rebuild after a teardown-less clear would persist
    * a second full copy). Teardown failures (e.g. an already-stopped
    * session) are ignored — a stopped session's blocks died with its
    * executors. Live-session entries rebuild on next access. */
  def clear(): Unit = {
    val it = cache.values.iterator()
    while (it.hasNext) {
      try teardown(it.next())
      catch { case scala.util.control.NonFatal(_) => () }
    }
    cache.clear()
  }
}

/** Process-wide registry of every staged cache, so a host that is done
  * with a dataset can release ALL its staged artifacts (graph, dedup
  * features, blocking assignments) without knowing which tiers exist. */
object SessionStaged {
  // weak references: the three shipped caches are object singletons,
  // but the class is a generic utility — a caller constructing one per
  // test or per job must not leak it (plus its map and captured
  // closures) into an append-only process-wide list forever. Cleared
  // refs are pruned on every sweep.
  private val instances =
    new java.util.concurrent.ConcurrentLinkedQueue[
      java.lang.ref.WeakReference[SessionStaged[_]]]

  private def register(s: SessionStaged[_]): Unit = {
    instances.add(new java.lang.ref.WeakReference(s)); ()
  }

  private def sweep(f: SessionStaged[_] => Unit): Unit = {
    val it = instances.iterator()
    while (it.hasNext) {
      val inst = it.next().get()
      if (inst == null) it.remove() else f(inst)
    }
  }

  /** Evict (session, dir) from every staged cache in the process. */
  def evictAll(s: SparkSession, dir: String): Unit = sweep(_.evict(s, dir))

  /** Tear down every entry of every staged cache (multi-session hosts,
    * heap-pressure experiments). Live sessions rebuild on next access. */
  def clearAll(): Unit = sweep(_.clear())
}
