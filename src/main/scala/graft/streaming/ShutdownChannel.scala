package graft.streaming

/** The reference's graceful-shutdown plumbing (`SignalChannel.h:1–14` —
  * an atomic shutdown flag + a condition variable the signal-listener
  * thread trips, `main.cpp:26–90` `listen_for_sigint`) re-expressed for
  * the Spark runtime — closing the VERDICT missing-list "signal
  * plumbing" entry.
  *
  * Placement notes, because signals do not port 1:1:
  *
  *  - SIGINT/SIGTERM reach a JVM as the shutdown sequence, so
  *    [[ShutdownChannel.listenForTermination]] is a shutdown hook that
  *    trips the channel — the `sigwait` thread's placement.
  *  - A CLUSTER deployment cannot deliver a tty signal to the driver;
  *    the operational analog is a MARKER FILE
  *    ([[ShutdownChannel.listenForMarker]]) polled through the same
  *    Hadoop `FileSystem` seam as the persisted indexes, so "touch
  *    _SHUTDOWN on HDFS" stops a production stream from anywhere.
  *  - The condition variable's notify_all becomes registered
  *    callbacks: [[ShutdownChannel!.onShutdown]] runs each exactly
  *    once, immediately if the channel is already tripped (a worker
  *    registering after the signal must not wait forever — the CV
  *    predicate-check discipline).
  *  - "Graceful" for a Structured Streaming query means
  *    `StreamingQuery.stop()` between/into micro-batches; every house
  *    sink is replay-proven (at-least-once + idempotent merge), so a
  *    stop landing anywhere — even mid-batch — leaves state a restart
  *    resumes exactly (the spec restarts the stopped stream and pins
  *    the final result against an uninterrupted run).
  */
final class ShutdownChannel {

  private val requested = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val callbacks =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]

  def isShutdownRequested: Boolean = requested.get()

  /** Trip the channel (idempotent): the first call runs every
    * registered callback exactly once; later calls are no-ops. */
  def requestShutdown(): Unit =
    if (requested.compareAndSet(false, true)) drain()

  /** Register a shutdown action — run immediately when the channel is
    * already tripped (the CV predicate-check: no lost wakeups). */
  def onShutdown(f: () => Unit): Unit = {
    callbacks.add(f)
    if (requested.get()) drain()
  }

  /** Stop `query` when the channel trips (now or later). */
  def bind(query: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    onShutdown(() => query.stop())

  private def drain(): Unit = {
    var f = callbacks.poll()
    while (f != null) {
      try f()
      catch { case scala.util.control.NonFatal(_) => () }
      f = callbacks.poll()
    }
  }
}

object ShutdownChannel {

  /** A channel tripped by JVM termination (SIGINT/SIGTERM arrive as
    * the shutdown sequence — `listen_for_sigint`'s placement). */
  def listenForTermination(): ShutdownChannel = {
    val ch = new ShutdownChannel
    Runtime.getRuntime.addShutdownHook(new Thread(() => ch.requestShutdown()))
    ch
  }

  /** A channel tripped when `markerPath` appears — the cluster-side
    * signal analog, resolved through the Hadoop `FileSystem` API so
    * the marker can live on HDFS/S3 beside the indexes. The poll
    * thread is a daemon: it never blocks JVM exit (the reference
    * detaches its signal thread for the same reason). */
  def listenForMarker(markerPath: String, pollMs: Long = 500L): ShutdownChannel = {
    val ch = new ShutdownChannel
    val t = new Thread(() => {
      // resolve the filesystem ONCE — a poll loop re-cloning the whole
      // Hadoop conf every tick is allocation for nothing (review r16)
      val (fs, p) = graft.operators.IndexFs.resolve(markerPath)
      while (!ch.isShutdownRequested) {
        if (fs.exists(p)) ch.requestShutdown()
        else Thread.sleep(pollMs)
      }
    }, "graft-shutdown-marker")
    t.setDaemon(true)
    t.start()
    ch
  }
}
