package graft.core

/** Per-JVM scratch space for operators that must stage data through the
  * filesystem (stream replays, format round-trips): one temp root, removed
  * recursively by a shutdown hook, so repeated bench/verify runs never
  * accumulate corpus-sized staging output under /tmp (round-5 advice).
  * Staging writes/reads are DISTRIBUTED (executor-side parquet/json/csv
  * jobs); only the empty directory creation happens on the driver. */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-scratch-")
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      if (Files.exists(r)) {
        val all = Files.walk(r).iterator().asScala.toSeq.reverse
        all.foreach { p: Path => try Files.deleteIfExists(p) catch { case _: Throwable => () } }
      }
    }
    r
  }

  /** A fresh scratch directory under the per-JVM root. */
  def dir(tag: String): String =
    java.nio.file.Files.createTempDirectory(root, tag).toString
}
