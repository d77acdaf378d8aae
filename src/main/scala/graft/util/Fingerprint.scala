package graft.util

/** Content fingerprint for on-disk sources that key derived artifacts
  * (bucketed tables, Z-order layouts, stream stage dirs, dedup corpus
  * indexes). Digesting (path, size, mtime) of every file under the
  * source means a REGENERATED source — same path, new bytes — yields a
  * new key, so a fresh JVM can never silently adopt artifacts derived
  * from data that no longer exists. Size+mtime (not content bytes) is
  * the same trade Spark's own file-index cache makes: free to compute
  * at 100 TB, and a rewrite that preserves both is indistinguishable
  * from no rewrite anyway.
  */
object Fingerprint {
  /** 16-hex-char MD5 over `path:size:mtime` of every file under `path`
    * (sorted traversal — stable across list order). */
  def of(path: String): String = {
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .toSeq.sortBy(_.getName).flatMap(files)
      else Seq(f)
    val desc = files(new java.io.File(path))
      .map(f => s"${f.getPath}:${f.length}:${f.lastModified}").mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(desc.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }
}
