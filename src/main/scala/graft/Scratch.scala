package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Temp-dir factory for sink round-trip operators (q37/q39/q40/q43,
  * st39). Every dir is registered for recursive deletion at JVM exit:
  * repeated bench/verify runs would otherwise accumulate unbounded
  * /tmp data across rounds (ADVICE r6). Deletion at exit — not after
  * the first read — because lazy sources (csv/orc/json/parquet) may
  * re-list the directory any time the plan re-executes (Bench runs
  * every query three times).
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach { d =>
      try {
        if (Files.exists(d)) {
          val walk = Files.walk(d)
          try walk.sorted(Comparator.reverseOrder[Path]())
            .forEach(p => { try Files.delete(p) catch { case _: Throwable => () } })
          finally walk.close()
        }
      } catch { case _: Throwable => () } // cleanup is best-effort by design
    }
  }, "graft-scratch-cleanup"))

  /** Create a temp directory that is deleted when this JVM exits. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}
