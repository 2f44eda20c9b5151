package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared funnel transition function (one definition under the
  * batch walker and StreamFunnel) against the declarative semantics the
  * oracle encodes: each stage = MIN event time of its type strictly
  * after the previous stage.
  */
class FunnelSpec extends AnyFunSuite {

  private val types = Vector("signup", "view", "click", "purchase", "error")

  /** brute-force chained correlated MINs */
  private def brute(evs: Seq[(String, Long)]): (Long, Long, Long, Long) = {
    def minAfter(typ: String, after: Long): Long =
      evs.collect { case (t, us) if t == typ && us > after => us }
        .minOption.getOrElse(-1L)
    val t1 = evs.collect { case ("signup", us) => us }.minOption.getOrElse(-1L)
    val t2 = if (t1 < 0) -1L else minAfter("view", t1)
    val t3 = if (t2 < 0) -1L else minAfter("click", t2)
    val t4 = if (t3 < 0) -1L else minAfter("purchase", t3)
    (t1, t2, t3, t4)
  }

  private def walk(evs: Seq[(String, Long)]): (Long, Long, Long, Long) = {
    val st = evs.foldLeft(Funnel.Empty) { case (s, (t, us)) => Funnel.step(s, t, us)._1 }
    (st.t1, st.t2, st.t3, st.t4)
  }

  test("time-ordered walk equals chained correlated MINs on random streams") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 200) {
      val n = 1 + rnd.nextInt(25)
      // tiny time range on purpose: equal timestamps are common, and the
      // walk must be tie-order independent (strict > excludes same-ts
      // chains no matter which side of the tie sorts first)
      val evs = Seq.fill(n)((types(rnd.nextInt(types.length)), rnd.nextInt(12).toLong))
      val sortedArbitraryTies = rnd.shuffle(evs).sortBy(_._2)
      assert(walk(sortedArbitraryTies) == brute(evs), s"trial $trial: $evs")
    }
  }

  test("stage hits carry latency from signup") {
    val evs = Seq(("signup", 10L), ("view", 13L), ("click", 14L), ("purchase", 20L))
    var st = Funnel.Empty
    val hits = evs.flatMap { case (t, us) =>
      val (next, hit) = Funnel.step(st, t, us); st = next; hit
    }
    assert(hits.map(h => (h.stage, h.latencyUs)) == Seq(
      ("s1_signup", 0L), ("s2_view", 3L), ("s3_click", 4L), ("s4_purchase", 10L)))
  }

  test("regressing or repeated stages never fire twice") {
    val evs = Seq(("signup", 1L), ("signup", 2L), ("view", 3L), ("view", 4L),
      ("signup", 5L), ("click", 3L) /* not > t2 */, ("click", 4L))
    var st = Funnel.Empty
    val hits = evs.flatMap { case (t, us) =>
      val (next, hit) = Funnel.step(st, t, us); st = next; hit
    }
    assert(hits.map(_.stage) == Seq("s1_signup", "s2_view", "s3_click"))
    assert(st == Funnel.State(1L, 3L, 4L, -1L))
  }
}
