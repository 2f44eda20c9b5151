package graft.textfn

/** The Misra-Gries frequency-summary transition — ONE definition shared
  * by the batch `text_heavy_hitters` partition kernel and the
  * `StreamHeavyHitters` state fold, so the two surfaces cannot drift
  * (the Funnel.step discipline).
  *
  * Holding at most `slots` counters: an arriving item increments its
  * counter, claims a free slot, or (map full) decrements EVERY counter
  * by one, dropping zeros — each decrement round retires slots+1
  * arrivals, so the fold is amortized O(1) per item. Over any folded
  * substream of n items, every item with true count > n/(slots+1)
  * survives, and a survivor's estimate undercounts its true count by at
  * most n/(slots+1) and never overcounts.
  */
object MisraGries {
  def fold(m: java.util.HashMap[String, java.lang.Long], tok: String, slots: Int): Unit = {
    val cur = m.get(tok)
    if (cur != null) m.put(tok, cur + 1L)
    else if (m.size < slots) m.put(tok, 1L)
    else {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }
}
