package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Epoch-directory layout shared by the streaming index rolls
  * ([[GraphEpochStream]], [[VectorEpochStream]]): `root/epoch=<batchId>`
  * children, listed and pruned with filesystem metadata only. Validity
  * (commit marker + parameter match) stays with each roll's own
  * IndexStore meta peek — this object never reads a marker. */
/** One epoch-id namespace, two writers (the tiers that have MAINTENANCE
  * majors — vector, PQ, IVFADC, media, signature): data epochs land at
  * `batchId × MaintenanceSlots`, maintenance majors (compaction, retrain)
  * at `standing-epoch-id + 1` — strictly between the last data epoch and
  * the next, so a maintenance commit can never collide with the NEXT
  * streaming batch's id and silently swallow that batch via the
  * replay-skip marker (review catch: at stride 1, a compaction after
  * batch N committed L1@N+1 and the real batch N+1 then replayed as
  * Skipped — durable data loss). Readers keep ordering epochs by a plain
  * Long sort. Up to MaintenanceSlots − 1 maintenance commits fit between
  * two data batches. The graph/lex tiers have no out-of-band writer and
  * keep raw batch ids. */
private[graft] object TierIds {
  val MaintenanceSlots: Long = 1L << 20
  def dataEpoch(batchId: Long): Long = {
    require(batchId >= 0 && batchId < Long.MaxValue / MaintenanceSlots,
      s"batchId $batchId out of the data-epoch range")
    batchId * MaintenanceSlots
  }
}

private[streaming] object EpochDirs {

  def dir(root: String, id: Long): String = s"$root/epoch=$id"

  /** Every `epoch=<id>` child id, in no particular order, valid or torn.
    * Listing only — no Spark jobs. */
  def rawIds(spark: SparkSession, root: String): Seq[Long] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("epoch="))
        scala.util.Try(n.stripPrefix("epoch=").toLong).toOption
      else None
    }
  }

  /** Delete every epoch directory OLDER than the whole kept set, torn or
    * valid. An id ABOVE any kept id is left alone — a torn head must
    * survive retention so its replayed batch can overwrite it in place. */
  def prune(spark: SparkSession, root: String, keep: Set[Long]): Unit = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return
    fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("epoch=")) {
        val id = scala.util.Try(n.stripPrefix("epoch=").toLong).toOption
        if (id.exists(i => !keep.contains(i) && keep.forall(i < _))) {
          fs.delete(st.getPath, true); ()
        }
      }
    }
  }
}
