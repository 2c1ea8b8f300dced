package graft

/** RawLocalFileSystem whose setTimes is a SILENT NO-OP, re-registered
  * under a non-`file` scheme — the object-store connector shape the
  * ticket-renewal mtime verification (r13) exists for: several
  * connectors return from setTimes without updating the mtime, so a
  * renewal that trusts a non-throwing touch keeps its in-process
  * lastTouch fresh while the on-disk ticket looks CRASHED to a
  * draining publisher.
  */
class NoTouchFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("notouch:///")
  override def setTimes(
      p: org.apache.hadoop.fs.Path, mtime: Long, atime: Long): Unit = ()
}
