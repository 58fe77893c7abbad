package graft.util

import java.nio.file.{Files, Path}

/** Scratch directories for queries that need on-disk round trips
  * (LakeTable demos, streaming staging). Registered for recursive
  * deletion at JVM exit so repeated Verify/Bench runs don't accumulate
  * orphaned parquet under /tmp.
  */
object TempDirs {

  private val created = scala.collection.mutable.ArrayBuffer.empty[Path]

  sys.addShutdownHook {
    created.synchronized {
      created.foreach { root =>
        try {
          import scala.jdk.CollectionConverters._
          Files.walk(root).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        } catch { case _: Throwable => () }
      }
    }
  }

  def scratch(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-$tag-")
    created.synchronized(created += p)
    p.toString
  }
}
