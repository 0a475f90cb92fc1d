package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Lifecycle registry for per-JVM scratch roots under /tmp.
  *
  * Several operators materialize derived layouts outside the Spark
  * session (Multimodal's shared frame table, BucketedJoin's bucketed
  * copies). The layouts are keyed per-pid so concurrent JVMs never race
  * one path — but that also means nobody else will ever clean them up.
  * Every scratch root registers here; one JVM shutdown hook removes all
  * of them, and callers that drop their in-memory cache entries
  * ([[graft.operators.Multimodal.clearFrameTableCache]]) can delete the
  * orphaned files eagerly via [[deleteRecursively]].
  */
object ScratchDirs {

  private val roots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  @volatile private var hookInstalled = false

  /** Register `root` for deletion at JVM exit (idempotent). Returns the
    * path unchanged so registration composes with val-initialization.
    */
  def register(root: String): String = {
    roots.add(root)
    if (!hookInstalled) synchronized {
      if (!hookInstalled) {
        Runtime.getRuntime.addShutdownHook(new Thread("graft-scratch-cleanup") {
          override def run(): Unit = {
            roots.forEach(r => deleteRecursively(r))
          }
        })
        hookInstalled = true
      }
    }
    root
  }

  /** Best-effort recursive delete; missing path is a no-op, and IO
    * failures are swallowed (shutdown must never throw).
    */
  def deleteRecursively(root: String): Unit = {
    val p: Path = Paths.get(root)
    if (Files.exists(p)) {
      try {
        val stream = Files.walk(p)
        try {
          stream
            .sorted(Comparator.reverseOrder[Path]())
            .forEach(f => { try Files.deleteIfExists(f) catch { case _: Exception => () } })
        } finally stream.close()
      } catch { case _: Exception => () }
    }
  }
}
