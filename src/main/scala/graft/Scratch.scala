package graft

/** Process-scoped scratch directories. Every temp dir the engine
  * materializes (memoized index builds, bench corpora, snapshot stores)
  * lives under one per-process root that a JVM shutdown hook deletes
  * recursively — repeated bench/verify runs no longer accumulate
  * 20×-amplified parquet corpora in the sandbox's /tmp. Callers treat
  * `dir(prefix)` exactly like `Files.createTempDirectory(prefix)`.
  */
object Scratch {
  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh scratch directory; removed with the whole root at JVM exit. */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
      } finally walk.close()
    }
  }
}
