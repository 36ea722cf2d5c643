package graft

/** Content-addressed locations for write-once materializations (bucketed
  * tables, partitioned layouts, incremental-agg partials, trained IVF
  * centroids, format round-trips).
  *
  * Why not `dir.hashCode`: a 32-bit string hash (the round-3 scheme) can
  * collide across two source dirs, `math.abs(Int.MinValue)` stays
  * negative, and — sharpest — a cache keyed only by the path silently
  * reuses STALE partials when the dir's contents change (an incremental
  * aggregate merged from a stale base is wrong with no error). The key
  * here digests the canonical path PLUS each source table's file
  * inventory (name, length, mtime), so any content change re-keys the
  * cache and re-materializes.
  *
  * On a real cluster these layouts live at curated lake paths with
  * explicit refresh policy; the digest scheme is the local-mode analogue
  * that keeps repeated Verify/Bench runs amortized AND correct.
  */
object Caches {
  private def digest(kind: String, srcDir: String, tables: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def feed(s: String): Unit = { md.update(s.getBytes("UTF-8")); md.update(0.toByte) }
    val canon = new java.io.File(srcDir).getCanonicalPath
    feed(kind); feed(canon)
    for (t <- tables.sorted) {
      val f = new java.io.File(canon, s"$t.parquet")
      feed(t)
      val files = if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq else Seq(f)
      for (p <- files) { feed(p.getName); feed(p.length.toString); feed(p.lastModified.toString) }
    }
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** A per-(kind, source-content) directory under the JVM tmpdir. */
  def dir(kind: String, srcDir: String, tables: Seq[String]): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cache/${kind}_${digest(kind, srcDir, tables)}"

  /** A catalog-safe suffix for session-registered table names keyed the
    * same way (bucketed tables must re-register per source content). */
  def tableSuffix(kind: String, srcDir: String, tables: Seq[String]): String =
    digest(kind, srcDir, tables)
}
