package graft.queries

import java.nio.file.{Files, Path}

/** Temp-dir staging shared by the fixture-staging query entries: every
  * directory handed out here is removed at JVM exit by ONE shutdown hook
  * (callers must not add their own per-dir hooks — a bench loop would
  * accumulate an unbounded hook list).
  */
private[graft] object TempDirs {

  /** Recursive delete, ignoring races/missing files (cleanup best-effort). */
  def deleteRecursively(root: Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    } catch { case _: Exception => () }

  private val exitDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private lazy val exitHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      import scala.jdk.CollectionConverters._
      exitDirs.iterator().asScala.foreach(deleteRecursively)
    }))

  /** Create a temp dir under `parent` (or the default tmp dir) that the
    * single exit hook removes at JVM shutdown.
    */
  def tempDirCleanedAtExit(parent: Option[Path], prefix: String): Path = {
    exitHook
    val d = parent match {
      case Some(p) => Files.createTempDirectory(p, prefix)
      case None => Files.createTempDirectory(prefix)
    }
    exitDirs.add(d)
    d
  }
}
