package graft.testfs

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem

/** A local filesystem registered under the fake scheme `graftfs://` —
  * the seam probe for the persisted-index tier's Hadoop `FileSystem`
  * port (VERDICT r15 item 1): a path like `graftfs:///tmp/x` is
  * unreadable by `java.io.File`/`java.nio.file` (the scheme is not a
  * directory), so every index component that completes its lifecycle
  * over such a path provably resolves ALL its metadata — commit
  * markers, generation listings, compaction heuristics, manifests —
  * through `Path.getFileSystem(conf)`. Registered per-test via
  * `fs.graftfs.impl` in the session's Hadoop conf; backed by
  * RawLocalFileSystem so the bytes land on local disk where the spec
  * can stage and reap them. */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
