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
  private lazy val cleanupHookInstalled: Boolean = {
    sys.addShutdownHook {
      import scala.reflect.io.Directory
      cleanupDirs.forEach(d =>
        new Directory(new java.io.File(d)).deleteRecursively())
    }
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
