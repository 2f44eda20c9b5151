package org.apache.spark

/** Minimal bridge into `private[spark]` SparkContext internals, in the
  * same spirit as [[org.apache.spark.sql.GraftSqlBridge]]: the bench
  * harness snapshots listener-fed metric counters around each timed
  * run, and the listener bus is asynchronous — without a drain, a
  * task's shuffle/spill bytes can land in the NEXT query's window.
  */
object GraftCoreBridge {

  /** Block until every event already posted to the listener bus has
    * been delivered to all listeners. Bounded (30 s) so a wedged
    * listener can degrade metric attribution but never hang the bench.
    */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(30000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
