package graft

import java.nio.file.{Files, Path}

/** Temp directories for gate queries that exercise real store/ingest IO
  * (throwaway warehouses, JSONL/CSV drop dirs). Results are LAZY frames
  * that still read from these paths when the driver materializes them,
  * so deletion can't happen inline — instead every dir registers for
  * recursive removal at JVM exit, so repeated gate/bench runs don't
  * accumulate dead warehouses in /tmp. */
object TempDirs {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try deleteRecursively(p.toFile)
      catch { case _: Exception => () } // best effort — it's /tmp
    }
  }))

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Create a temp dir that is removed when the JVM exits. */
  def tempDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
