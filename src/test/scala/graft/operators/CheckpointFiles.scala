package graft.operators

import java.io.File

/** Test-side probe of a reliable checkpoint directory: Spark lays files out
  * as `<dir>/<app-uuid>/rdd-<id>/part-*` — the `rdd-*` directories are the
  * unit [[Checkpoints.release]] deletes. */
object CheckpointFiles {
  def rddDirs(root: File): Seq[File] = {
    def walk(f: File): Seq[File] =
      Option(f.listFiles).toSeq.flatten
        .flatMap(c => c +: (if (c.isDirectory) walk(c) else Nil))
    walk(root).filter(f => f.isDirectory && f.getName.startsWith("rdd-"))
  }
}
