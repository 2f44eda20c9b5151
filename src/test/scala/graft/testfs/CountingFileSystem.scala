package graft.testfs

import java.net.URI
import java.util.concurrent.atomic.AtomicLong
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** [[GraftTestFileSystem]]'s metering sibling, scheme `graftcnt://`:
  * counts metadata calls (listStatus, getFileStatus — `exists` funnels
  * through the latter) so a spec can ASSERT a component's filesystem
  * call complexity instead of arguing it — the VERDICT r16 item 3a
  * seam: `ServingSnapshot.verify` must run one listing per pinned
  * generation directory, never one existence RPC per pinned file.
  * Counters are static because Hadoop caches FileSystem instances per
  * (scheme, conf); tests [[CountingFileSystem.reset]] around the call
  * under measurement. */
class CountingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftcnt"
  override def getUri: URI = URI.create("graftcnt:///")

  override def listStatus(p: Path): Array[FileStatus] = {
    CountingFileSystem.listCalls.incrementAndGet()
    // RawLocalFileSystem.listStatus stats each child internally — on a
    // real store one listing is ONE RPC however many children it
    // returns, so nested getFileStatus calls must not count
    CountingFileSystem.inList.set(true)
    try super.listStatus(p)
    finally CountingFileSystem.inList.set(false)
  }

  override def getFileStatus(p: Path): FileStatus = {
    if (!CountingFileSystem.inList.get()) {
      CountingFileSystem.statCalls.incrementAndGet(); ()
    }
    super.getFileStatus(p)
  }
}

object CountingFileSystem {
  val listCalls = new AtomicLong(0L)
  val statCalls = new AtomicLong(0L)
  private[testfs] val inList = ThreadLocal.withInitial[java.lang.Boolean](() => false)
  def reset(): Unit = { listCalls.set(0L); statCalls.set(0L) }
  def total: Long = listCalls.get() + statCalls.get()
}
