package graft.core

import java.nio.file.{Files, Path, Paths}

/** Persistent staging for queries that demonstrate an operator OVER a
  * staged layout (merge targets, fragmented landing zones, multi-
  * generation schema dirs): the layout is written once per (input
  * dataset, tag) and reused across JVMs, so steady-state runs pay for
  * the OPERATOR, not for rebuilding its fixture — the same
  * amortization the persistent catalog gives q35/q36 and the chunk
  * cache gives the streaming gates (EventStreams.stageEventChunks,
  * whose keying/marker discipline this generalizes).
  *
  * Key = md5 over (input dir, tag, source size+mtime): regenerated
  * testdata at the same path invalidates the cache instead of silently
  * reusing a stale layout. The completion marker is written LAST — a
  * JVM dying mid-staging leaves no marker and the next caller
  * re-stages. Callers may mutate the staged dir only if the mutation
  * is idempotent and derived from the SOURCE tables (q43/q47's dynamic
  * partition overwrite recomputes merged partitions from the source of
  * truth, so a re-run converges to the same bytes).
  */
object Staging {

  /** Scratch dirs that must disappear at JVM exit, deleted by ONE
    * shutdown hook over a registry (a hook per call site accumulated
    * hooks across repeated runs in a session, and `deleteOnExit` only
    * removes empty dirs). Deletion waits for exit because callers
    * return LAZY frames reading these dirs.
    */
  private val cleanupDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Recursive delete that NEVER follows symlinks: `walkFileTree`
    * without FOLLOW_LINKS visits a symlink (even to a directory) as a
    * plain file, so only the LINK is unlinked — its target is
    * untouched. This is load-bearing: the streaming file source
    * symlinks the read-only source dataset into its scratch dir, and
    * a link-following recursive delete (scala.reflect.io.Directory
    * has no symlink guard) would delete the real data behind it.
    */
  def deleteTree(root: String): Unit = {
    import java.nio.file.{Files => F, _}
    import java.nio.file.attribute.BasicFileAttributes
    val p = Paths.get(root)
    if (F.exists(p, LinkOption.NOFOLLOW_LINKS)) {
      F.walkFileTree(p, new SimpleFileVisitor[Path] {
        override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
          F.deleteIfExists(f); FileVisitResult.CONTINUE
        }
        override def postVisitDirectory(d: Path, e: java.io.IOException): FileVisitResult = {
          F.deleteIfExists(d); FileVisitResult.CONTINUE
        }
      })
      ()
    }
  }

  private lazy val cleanupHookInstalled: Boolean = {
    sys.addShutdownHook(cleanupDirs.forEach(deleteTree(_)))
    true
  }
  def registerAtExit(dir: String): Unit = {
    require(cleanupHookInstalled)
    cleanupDirs.add(dir); ()
  }
  /** `createTempDirectory` + exit-time recursive deletion. */
  def tempAtExit(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix).toString
    registerAtExit(dir)
    dir
  }

  def ensure(d: String, srcTable: String, tag: String)
      (write: String => Unit): String = {
    val src = Paths.get(s"$d/$srcTable.parquet")
    val ident = s"$d:$tag:${Files.size(src)}:" +
      Files.getLastModifiedTime(src).toMillis
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(ident.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val dir: Path = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_stage_${tag}_$key")
    val marker = dir.resolve("_GRAFT_STAGED")
    if (!Files.exists(marker)) {
      write(dir.toString)
      Files.createFile(marker)
    }
    dir.toString
  }
}
