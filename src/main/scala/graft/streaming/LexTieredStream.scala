package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Checkpoints, IndexStore, Postings}

/** TIERED (L0/L1) epoch commits for the LEXICAL family — the
  * [[GraphTieredStream]]/[[VectorTieredStream]] design applied to the
  * BM25 postings roll, the third (and semantically hardest) instance:
  * [[LexEpochStream]] pays an O(|corpus postings|) rewrite per batch for
  * durability, and unlike the other families a lex batch can EDIT or
  * DELETE standing documents, so tiers must shadow, not just append.
  *
  *  - **Bootstrap**: the first non-empty batch builds and commits the
  *    first L1 ([[Postings.build]] → [[IndexStore.savePostingsIndex]]).
  *  - **L0 (minor)**: the batch lands as a self-contained
  *    [[Postings.tierFrame]] — per-doc postings with token-free docs as
  *    explicit NULL tombstone rows — under `root/l0/epoch=<batchId>`, an
  *    O(|Δ|) tokenize + write. No standing state is read at all.
  *  - **L1 (major)**: every `majorEvery`-th commit merges the standing
  *    L1 with all live L0 tiers ([[Postings.mergeTiers]] — sequential
  *    foldDocs semantics: tier docs shadow standing, newest tier wins)
  *    and commits the merged index under `root/l1/epoch=<batchId>`, then
  *    prunes the L0s it absorbed. Amortized per-batch rewrite cost drops
  *    from O(|postings|) to O(|postings| / majorEvery + |Δ|).
  *
  * Readers ([[loadCurrent]] → [[Tiered]]) merge ≤ 2 tiers into an
  * ordinary [[Postings.Index]] — BM25 probes (`bm25ScoresOverIndex`) and
  * the serving stream work on the tiered view unchanged, and because
  * [[Postings.mergeTiers]] replays the foldDocs chain exactly, ranked
  * answers are identical to the flat roll's (t40's oracle certifies the
  * lifecycle, replacements and deletes included, against a from-scratch
  * SQL rebuild of the effective corpus). Unlike the graph/vector tiered
  * reads, a lex load pays THREE doc-grain jobs (the closed-form stats —
  * nDocs/sumDl must be exact Longs for the idf/length-norm contract);
  * probes after the load are plan-only.
  *
  * CRASH MATRIX (the sibling tiers', verbatim — each epoch's IndexStore
  * meta is its commit marker): torn L0 → invisible → replay re-tokenizes
  * deterministically and overwrites; torn L1 major → standing L1 + every
  * L0 still live (pruning only after commit) → replay recompacts; commit
  * in either tier → replay SKIPS; L1 keeps 2 generations and a major
  * prunes only L0s ≤ the PREVIOUS L1, so a reader pinned to generation
  * N−1 survives one subsequent major. Single writer. */
object LexTieredStream {

  import BatchOutcome._

  private def l0Root(root: String) = s"$root/l0"
  private def l1Root(root: String) = s"$root/l1"

  private val Params: Map[String, String] = Map("tokenizer" -> "ws")
  private val L0Params: Map[String, String] = Params + ("tier" -> "l0_postings")

  /** Committed L1 epoch ids, newest first. Listing + marker peek only. */
  def l1Epochs(spark: SparkSession, root: String): Seq[Long] =
    EpochDirs.rawIds(spark, l1Root(root))
      .filter(id => IndexStore.postingsIndexMeta(spark,
        EpochDirs.dir(l1Root(root), id), Params).isDefined)
      .sorted(Ordering[Long].reverse)

  /** Committed L0 epoch ids, newest first. */
  def l0Epochs(spark: SparkSession, root: String): Seq[Long] =
    EpochDirs.rawIds(spark, l0Root(root))
      .filter(id => IndexStore.stageMeta(spark,
        EpochDirs.dir(l0Root(root), id), L0Params).isDefined)
      .sorted(Ordering[Long].reverse)

  /** The ≤-2-tier reader view: `index` is an ordinary [[Postings.Index]]
    * (the newest committed L1 merged with the live L0 tiers above it,
    * foldDocs semantics). `release()` frees the merge's persist AND the
    * underlying L1 handle. */
  final case class Tiered(
      epochId: Long,
      index: Postings.Index,
      liveL0s: Seq[Long],
      release: () => Unit)

  /** The id [[loadCurrent]] would return — the serving pin's zero-job
    * staleness check (listing + marker peeks only). */
  def currentEpochId(spark: SparkSession, root: String): Option[Long] =
    l1Epochs(spark, root).headOption.map { l1 =>
      (l1 +: l0Epochs(spark, root).filter(_ > l1)).max
    }

  /** Load the newest committed tiered view; `None` before the bootstrap
    * L1 commits. Pays the mergeTiers stats jobs when live L0s exist
    * (zero jobs otherwise). */
  def loadCurrent(spark: SparkSession, root: String): Option[Tiered] =
    l1Epochs(spark, root).headOption.flatMap { l1Id =>
      IndexStore.loadPostingsIndex(spark, EpochDirs.dir(l1Root(root), l1Id),
        expectedParams = Params).map { l1 =>
        // a merge failure (executor loss, a concurrent writer pruning a
        // listed L0 mid-read) must not strand the L1's persisted frames —
        // the foldBatch major guards its merge the same way
        try {
          val liveL0 = l0Epochs(spark, root).filter(_ > l1Id).sorted
          val tiers = liveL0.flatMap(id =>
            IndexStore.loadStage(spark, EpochDirs.dir(l0Root(root), id),
              None, L0Params).map(id -> _))
          val merged = Checkpoints.sweepingOnFailure(spark.sparkContext)(
            Postings.mergeTiers(l1, tiers))
          Tiered((l1Id +: liveL0).max, merged, liveL0,
            () => { merged.release(); l1.release() })
        } catch { case t: Throwable => l1.release(); throw t }
      }
    }

  /** Fold ONE batch of documents (`doc_id`, `text` columns): an O(|Δ|)
    * L0 commit, except the bootstrap batch (builds, commits L1) and
    * every `majorEvery`-th live delta (triggers the L1 major).
    * Idempotent under replay (either tier's committed marker skips).
    * Pure batch logic — unit-testable without a stream. */
  def foldBatch(docsBatch: DataFrame, root: String, batchId: Long,
                majorEvery: Int = 8): BatchOutcome = {
    require(majorEvery >= 2, s"majorEvery must be >= 2, got $majorEvery")
    val spark = docsBatch.sparkSession
    val l0Dir = EpochDirs.dir(l0Root(root), batchId)
    val l1Dir = EpochDirs.dir(l1Root(root), batchId)
    if (IndexStore.stageMeta(spark, l0Dir, L0Params).isDefined ||
        IndexStore.postingsIndexMeta(spark, l1Dir, Params).isDefined)
      return Skipped // replayed after a committed save — already applied
    Deltas.withMaterialized(docsBatch) { delta =>
      if (delta.isEmpty) EmptyBatch // no content-free epochs
      else foldNonEmpty(spark, delta, root, batchId, majorEvery, l0Dir, l1Dir)
    }
  }

  private def foldNonEmpty(spark: SparkSession, docsBatch: DataFrame,
                           root: String, batchId: Long, majorEvery: Int,
                           l0Dir: String, l1Dir: String): BatchOutcome = {
    l1Epochs(spark, root).headOption match {
      case None =>
        val idx = Checkpoints.sweepingOnFailure(spark.sparkContext)(
          Postings.build(docsBatch))
        try IndexStore.savePostingsIndex(spark, idx, l1Dir,
          s"batch:$batchId bootstrap", Params)
        finally idx.release()
        Bootstrapped
      case Some(prevL1) =>
        val liveL0 = l0Epochs(spark, root).filter(_ > prevL1)
        if (liveL0.size + 1 < majorEvery) {
          // MINOR: the O(|Δ|) self-contained tier commit — no standing
          // state read, no handles held
          IndexStore.saveStage(spark, Postings.tierFrame(docsBatch),
            l0Dir, s"batch:$batchId", L0Params)
          Minor
        } else {
          // MAJOR: merge standing L1 + live tiers + this batch (foldDocs
          // semantics via mergeTiers) into a full committed index; prune
          // absorbed L0s (grace: only those ≤ the PREVIOUS L1) and old
          // L1 generations after the commit
          val l1 = IndexStore.loadPostingsIndex(spark,
            EpochDirs.dir(l1Root(root), prevL1), expectedParams = Params)
            .getOrElse(sys.error(s"standing L1 epoch=$prevL1 vanished mid-fold"))
          // Strict per-L0 load: a listed committed delta that fails to
          // load mid-major would be silently ABSENT from the new L1
          // (durable data loss) if we tolerated it — fail loudly, like
          // the standing-L1 vanish above. Readers stay tolerant.
          val tiers = liveL0.sorted.map(id =>
            id -> IndexStore.loadStage(spark, EpochDirs.dir(l0Root(root), id),
              None, L0Params).getOrElse(
              sys.error(s"committed L0 epoch=$id vanished mid-major"))) :+
            (batchId -> Postings.tierFrame(docsBatch))
          val merged = try Checkpoints.sweepingOnFailure(spark.sparkContext)(
            Postings.mergeTiers(l1, tiers))
          catch { case t: Throwable => l1.release(); throw t }
          try IndexStore.savePostingsIndex(spark, merged, l1Dir,
            s"batch:$batchId major absorbed=${liveL0.size}", Params)
          finally { merged.release(); l1.release() }
          EpochDirs.prune(spark, l1Root(root),
            l1Epochs(spark, root).take(2).toSet)
          val keep = l0Epochs(spark, root).filter(_ > prevL1).toSet
          EpochDirs.prune(spark, l0Root(root), keep + batchId)
          Major(liveL0.size)
        }
    }
  }

  /** Start the tiered roll: `docs` (a streaming `(doc_id, text)` frame) →
    * per-batch [[foldBatch]] → committed L0/L1 epochs under `root`. */
  def start(docs: DataFrame, root: String, checkpointDir: String,
            majorEvery: Int = 8,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, root, batchId, majorEvery)
        ()
      }
      .start()
}
