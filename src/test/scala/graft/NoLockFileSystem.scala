package graft

/** RawLocalFileSystem re-registered under a non-`file` scheme —
  * simulates an object-store-like root for CatalogSpec: no OS
  * byte-range locks are taken (BucketCatalog's local-FS lock path is
  * scheme-gated), so the writer-LEASE guard must carry the
  * single-writer contract instead.
  */
class NoLockFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("nolock:///")
}
