package graft.io

/** Cleanup for the per-invocation temp roots the tiered-roll queries
  * (q81/q82/v27/v28/v33/t40) commit their epochs under. Each invocation
  * pays a fresh roll into its own root — that is the measured artifact —
  * but the root itself is garbage the moment the merged view is collected,
  * and the bench's retime pass makes repeat invocations within one session
  * routine: without deletion a long median/bench session accumulates
  * unbounded /tmp parquet (r14 ADVICE). Depth-first delete, errors
  * swallowed — cleanup must never mask the query's own result. */
object TempRoots {
  def delete(root: String): Unit =
    try {
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        val all = java.nio.file.Files.walk(p)
        try all.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => try { java.nio.file.Files.deleteIfExists(f); () }
            catch { case _: Exception => () })
        finally all.close()
      }
    } catch { case _: Exception => () }
}
