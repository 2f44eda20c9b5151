package graft.operators

/** THE funnel state machine — one definition of the stage transition
  * rules, shared by the batch `q_events_funnel` walker and the
  * streaming `StreamFunnel`, so the documented batch/stream equivalence
  * holds by construction rather than by parallel maintenance.
  *
  * Semantics: each stage's timestamp is the first event of that type
  * STRICTLY after the previous stage's timestamp (≡ the oracle's
  * chained correlated MINs when events are walked in time order).
  */
object Funnel {

  final case class State(t1: Long, t2: Long, t3: Long, t4: Long)
  val Empty: State = State(-1L, -1L, -1L, -1L)

  final case class Hit(stage: String, latencyUs: Long)

  /** One transition: the (possibly updated) state plus the stage hit,
    * if this event claimed one. Latency is measured from the signup
    * stage (0 for signup itself). */
  def step(st: State, eventType: String, us: Long): (State, Option[Hit]) =
    eventType match {
      case "signup" if st.t1 < 0 =>
        (st.copy(t1 = us), Some(Hit("s1_signup", 0L)))
      case "view" if st.t1 >= 0 && st.t2 < 0 && us > st.t1 =>
        (st.copy(t2 = us), Some(Hit("s2_view", us - st.t1)))
      case "click" if st.t2 >= 0 && st.t3 < 0 && us > st.t2 =>
        (st.copy(t3 = us), Some(Hit("s3_click", us - st.t1)))
      case "purchase" if st.t3 >= 0 && st.t4 < 0 && us > st.t3 =>
        (st.copy(t4 = us), Some(Hit("s4_purchase", us - st.t1)))
      case _ => (st, None)
    }
}
