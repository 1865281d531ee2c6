package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Rolling co-purchase graph from the RAW fact stream — the missing hop
  * between a lineitem feed and [[GraphEpochStream]]: deriving edges
  * per-batch with a plain pair-gen self-join silently DROPS every pair
  * whose two lines arrive in different micro-batches (an order is not a
  * batch-local object). The incremental-join identity fixes it the way
  * [[graft.operators.IncrementalJoin]] maintains join views:
  *
  *   Δedges = Δ ⋈ standing (both directions) ∪ Δ ⋈ Δ,   keyed on order
  *
  * so a pair materializes exactly when its LATER line arrives. The
  * standing side prunes to the batch's TOUCHED ORDERS by a semi-join
  * before any pair expansion — pair-expansion cost is |Δ|-proportional,
  * never a standing×standing re-generation. Derived deltas feed
  * [[GraphEpochStream.foldBatch]] (dedup = true absorbs the duplicate
  * edges replays and standing/delta overlaps produce), so the rolled
  * index converges to `Adjacency.build(copurchasePairs(all lines))`
  * bit-identically.
  *
  * Standing-scan cost (honest accounting — r11 advice): the semi-join
  * prunes pair EXPANSION to touched orders, but the standing lines still
  * have to be SCANNED each batch. Two mechanisms bound that scan:
  *
  *  - '''Compaction''': once more than `compactEvery` committed
  *    `batch=<id>` delta directories accumulate, they fold (together with
  *    the previous segment) into ONE `segment=<maxId>` store — directory
  *    count and small-file count stay O(compactEvery) for the life of the
  *    stream instead of O(#batches).
  *  - '''Bucket pruning''': the segment is hive-partitioned by
  *    `ob = pmod(o, 64)`, and each batch reads only the partitions of its
  *    own touched order-buckets (a bounded ≤64-value literal IN filter —
  *    real `PartitionFilters` pruning, no optimizer coin-flip). A batch
  *    touching few buckets scans that fraction of standing, not all of it.
  *
  * Per-batch cost is therefore |Δ| pair work + a scan of the touched
  * slice of standing (worst case O(|standing|) when a batch touches every
  * bucket) — not the unbounded listing+scan growth of the pre-compaction
  * layout.
  *
  * State: processed lines land under `linesDir/batch=<id>` (overwrite —
  * replay-idempotent); the standing read EXCLUDES the current batch id,
  * so a replayed batch derives the same delta it derived the first time.
  * Compaction only ever folds ids STRICTLY BELOW the current batch
  * (those are committed — foreachBatch is sequential), so a replayed
  * batch's own lines are never baked into a segment it must exclude.
  * Crash matrix: lines written but epoch torn → the replay overwrites the
  * lines (same content) and re-folds; epoch committed but the checkpoint
  * not → the replay rewrites lines and [[GraphEpochStream.foldBatch]]
  * skips the already-applied fold; crash mid-compaction → the torn
  * `segment=` directory has no `_SUCCESS` marker, readers ignore it, and
  * the replayed batch re-compacts over it (overwrite). A committed
  * segment whose source batch dirs were not yet GC'd is also safe:
  * readers use the newest committed segment plus only batch ids ABOVE it,
  * so the not-yet-deleted dirs are never double-counted. Single-writer,
  * like every epoch artifact. */
object CopurchaseStream {

  private val LineSchema = StructType(Seq(
    StructField("o", LongType), StructField("p", LongType)))

  /** Segment read schema: the hive partition column `ob` DECLARED as
    * LONG. Without it Spark infers the partition column as INT, the
    * Long-literal `isin` filter wraps the attribute in a cast, and the
    * predicate can fall out of PartitionFilters — the scan then reads
    * all 64 buckets (correct, but the documented pruning guarantee
    * silently degrades; r12 advice). Spec-asserted via the plan's
    * PartitionFilters (CopurchaseStreamSpec). */
  private[streaming] val SegmentSchema = StructType(Seq(
    StructField("o", LongType), StructField("p", LongType),
    StructField("ob", LongType)))

  /** Order-bucket count for the segment's partition key — the unit of
    * standing-scan pruning. */
  private[streaming] val OrderBuckets = 64

  /** One committed segment, with `ob` read under [[SegmentSchema]] so
    * bucket `isin` predicates stay in PartitionFilters (package-visible
    * for the spec's plan assertion). */
  private[streaming] def readSegment(spark: SparkSession, linesDir: String,
                                     id: Long): DataFrame =
    spark.read.schema(SegmentSchema).parquet(s"$linesDir/segment=$id")

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def childIds(spark: SparkSession, linesDir: String,
                       prefix: String): Seq[Long] = {
    val root = new Path(linesDir)
    val fs = fsOf(spark, linesDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith(prefix))
        scala.util.Try(n.stripPrefix(prefix).toLong).toOption
      else None
    }
  }

  /** Newest COMMITTED segment id — commit marker is the `_SUCCESS` file
    * Spark's job committer writes last, so a torn compaction is invisible. */
  private def newestSegment(spark: SparkSession, linesDir: String): Option[Long] =
    childIds(spark, linesDir, "segment=").filter { id =>
      fsOf(spark, linesDir).exists(
        new Path(s"$linesDir/segment=$id/_SUCCESS"))
    }.sorted(Ordering[Long].reverse).headOption

  /** Committed delta-batch ids above the newest segment (a dir ≤ the
    * segment id is a GC leftover already folded in — never re-read). */
  private def liveBatchIds(spark: SparkSession, linesDir: String,
                           excludeId: Long): Seq[Long] = {
    val floor = newestSegment(spark, linesDir).getOrElse(Long.MinValue)
    childIds(spark, linesDir, "batch=")
      .filter(id => id > floor && id != excludeId)
  }

  /** All standing lines of batches BEFORE (≠) `excludeId`: newest
    * committed segment + live delta dirs. `touchedBuckets` (None = all)
    * prunes the segment scan to the listed `ob` partitions. Empty-schema
    * frame at bootstrap. */
  private def standingLines(spark: SparkSession, linesDir: String,
                            excludeId: Long,
                            touchedBuckets: Option[Seq[Long]]): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], LineSchema)
    val seg = newestSegment(spark, linesDir).map { id =>
      val s = readSegment(spark, linesDir, id)
      touchedBuckets.fold(s)(bs => s.filter(col("ob").isin(bs: _*)))
        .select("o", "p")
    }.getOrElse(empty)
    val dirs = liveBatchIds(spark, linesDir, excludeId)
      .map(id => s"$linesDir/batch=$id")
    val deltas =
      if (dirs.isEmpty) empty
      else spark.read.schema(LineSchema).parquet(dirs: _*)
    seg.unionByName(deltas)
  }

  /** Fold every committed delta dir strictly below `batchId` (plus the
    * previous segment) into one `segment=<maxFoldedId>` store,
    * partitioned by order bucket, then GC the folded sources. Idempotent:
    * a replayed batch that crashed mid-compaction simply overwrites the
    * torn segment with identical content. No-op when fewer than
    * `threshold` live delta dirs exist. */
  private[streaming] def maybeCompact(spark: SparkSession, linesDir: String,
                                      batchId: Long, threshold: Int): Unit = {
    val ids = liveBatchIds(spark, linesDir, excludeId = batchId)
      .filter(_ < batchId)
    if (ids.size < threshold) return
    val newSegId = ids.max
    // read EXACTLY the folded set (previous segment + the ids ≤ newSegId)
    // so the new segment's id is a true floor for its contents
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], LineSchema)
    val prevSeg = newestSegment(spark, linesDir).map(id =>
      readSegment(spark, linesDir, id).select("o", "p"))
      .getOrElse(empty)
    val all = prevSeg.unionByName(
      spark.read.schema(LineSchema)
        .parquet(ids.map(id => s"$linesDir/batch=$id"): _*))
    all.withColumn("ob", pmod(col("o"), lit(OrderBuckets.toLong)))
      .repartition(col("ob")) // ≤1 file per bucket, not #sources × buckets
      .write.mode("overwrite").partitionBy("ob")
      .parquet(s"$linesDir/segment=$newSegId")
    // GC folded sources + superseded/torn segments; pure garbage collection
    // (readers already ignore ids ≤ the newest committed segment)
    val fs = fsOf(spark, linesDir)
    childIds(spark, linesDir, "batch=").filter(_ <= newSegId).foreach { id =>
      fs.delete(new Path(s"$linesDir/batch=$id"), true); ()
    }
    childIds(spark, linesDir, "segment=").filter(_ != newSegId).foreach { id =>
      fs.delete(new Path(s"$linesDir/segment=$id"), true); ()
    }
  }

  /** The delta co-purchase edges one batch of `(l_orderkey, l_partkey)`
    * lines adds over the standing lines: batch × standing-of-touched-
    * orders in BOTH directions plus batch × batch (the self-join emits
    * both directions itself). Pure batch logic over RAW order lines. */
  def deltaEdges(batch: DataFrame, standing: DataFrame): DataFrame =
    deltaEdgesNorm(batch.select(col("l_orderkey").cast("long").as("o"),
      col("l_partkey").cast("long").as("p")).distinct(), standing)

  /** [[deltaEdges]] over ALREADY-NORMALIZED distinct `(o, p)` lines —
    * [[foldBatch]] passes its pinned frame here so the batch's upstream
    * is scanned once across the whole fold. Private: the distinct is a
    * CORRECTNESS precondition (duplicate lines would multiply through
    * both self-join sides), so outside callers take the raw entry. */
  private def deltaEdgesNorm(b: DataFrame, standing: DataFrame): DataFrame = {
    // ONE join instead of three subtrees (b⋈s twice for the two
    // directions + b⋈b): join the batch against (pruned-standing ∪ batch)
    // and emit BOTH directions of each matched pair with a codegen'd
    // explode. Multiset note: batch×batch pairs now appear twice (the
    // self-join half already yields both roles, and the explode doubles
    // them) — every consumer is a dedup=true fold or a distinct, and the
    // edge SET is unchanged (CopurchaseStreamSpec pins convergence).
    // Before this rewrite the three-branch union re-executed the b⋈s join
    // per direction branch and paid a third shuffle for b⋈b — measured
    // 3.2–3.9 s of q82's per-batch cost, the query's dominant term.
    val touched = b.select("o").distinct()
    val s = standing.join(touched, Seq("o"), "left_semi")
    b.as("a").join(s.unionByName(b).as("x"),
        col("a.o") === col("x.o") && col("a.p") =!= col("x.p"))
      .select(explode(array(
        struct(col("a.p").as("src"), col("x.p").as("dst")),
        struct(col("x.p").as("src"), col("a.p").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
  }

  /** Process ONE batch: compact committed prior deltas when due, derive
    * the delta edges against the (bucket-pruned) standing lines, record
    * the batch's lines (overwrite — idempotent), fold the delta into the
    * newest graph epoch. Pure batch logic — unit-testable without a
    * stream. */
  def foldBatch(batch: DataFrame, linesDir: String, indexRoot: String,
                batchId: Long, keepEpochs: Int = 2,
                compactEvery: Int = 32): Unit =
    foldBatchWith(batch, linesDir, batchId, compactEvery)(edges =>
      GraphEpochStream.foldBatch(edges, indexRoot, batchId,
        dedup = true, keepEpochs = keepEpochs))

  /** [[foldBatch]] committing into a TIERED root
    * ([[GraphTieredStream]]): the derived delta lands as an O(|Δ|) L0
    * epoch instead of the flat roll's O(|corpus|) full-index rewrite —
    * the last roll that still paid the flat durability price per batch.
    * Within-batch distinct happens in the tiered fold; duplicates
    * against OLDER tiers (a pair re-derived through another order) stay
    * as rows in the minor and collapse at read/major exactly like the
    * flat fold's dedup = true, so the merged edge SET converges
    * identically (CopurchaseStreamSpec pins it). Same crash matrix: the
    * tier's committed marker makes a replayed fold a no-op. */
  def foldBatchTiered(batch: DataFrame, linesDir: String, indexRoot: String,
                      batchId: Long, majorEvery: Int = 8,
                      compactEvery: Int = 32): BatchOutcome = {
    // surfaced so a maintenance probe (Q82Scale) can attribute per-batch
    // cost to the REAL tier decision — majors fire on live-L0 count, not
    // batch-id arithmetic, and a mislabeled major reads as minor jitter
    var out: BatchOutcome = BatchOutcome.EmptyBatch
    foldBatchWith(batch, linesDir, batchId, compactEvery) { edges =>
      out = GraphTieredStream.foldBatch(edges, indexRoot, batchId, majorEvery)
      ()
    }
    out
  }

  /** The shared batch body behind the flat and tiered folds: line
    * normalization + pin, compaction, bucket listing, delta derivation,
    * the lines write, then `fold` over the pinned delta edges. */
  private def foldBatchWith(batch: DataFrame, linesDir: String,
                            batchId: Long, compactEvery: Int)
                           (fold: DataFrame => Unit): Unit = {
    val spark = batch.sparkSession
    // one materialization of the batch's lines serves the emptiness probe,
    // the bucket listing, the lines write, AND deltaEdges' two join sides
    // (a foreachBatch frame re-computes its upstream per action otherwise)
    val lines = batch.select(col("l_orderkey").cast("long").as("o"),
      col("l_partkey").cast("long").as("p")).distinct()
    import graft.io.JobLabels.labeled
    Deltas.withMaterialized(lines) { pinned =>
      // touched order-buckets of THIS delta: a bounded (≤ OrderBuckets)
      // driver list that becomes the segment scan's partition filter —
      // and, being the batch's first action, it doubles as the emptiness
      // probe (empty ⇔ no buckets), saving the separate isEmpty job
      val buckets = labeled(spark.sparkContext, s"copurchase b$batchId: buckets") {
        pinned.select(pmod(col("o"), lit(OrderBuckets.toLong)).as("ob"))
          .distinct().collect().map(_.getLong(0)).toSeq
      }
      if (buckets.nonEmpty) {
        // compaction first, over ids < batchId only: state it folds is
        // committed, and a replay of THIS batch re-runs it idempotently
        labeled(spark.sparkContext, s"copurchase b$batchId: compact")(
          maybeCompact(spark, linesDir, batchId, compactEvery))
        // standing must be read under the PREVIOUS batches' view (exclude
        // a crashed attempt's own lines) BEFORE this batch's lines land;
        // the write then happens before the fold so a torn fold replays
        // over complete state
        val edges = deltaEdgesNorm(pinned,
            standingLines(spark, linesDir, batchId, Some(buckets)))
          .persist()
        try {
          val n = labeled(spark.sparkContext, s"copurchase b$batchId: delta-edges")(
            edges.count()) // pin the delta BEFORE the lines write changes state
          labeled(spark.sparkContext, s"copurchase b$batchId: lines-write")(
            pinned.write.mode("overwrite").parquet(s"$linesDir/batch=$batchId"))
          // the fold's shuffles (within-batch distinct, a major's
          // re-aggregation) are |Δ|-sized — run them at the measured
          // width (lower-only; a cluster session keeps its parallelism)
          graft.operators.Checkpoints.withShufflePartitions(spark,
            graft.operators.Checkpoints.partitionsForRows(n))(fold(edges))
        } finally { edges.unpersist(); () }
      }
    }
  }

  /** Start the roll: a stream of raw order lines → per-batch
    * [[foldBatch]] → committed co-purchase graph epochs under
    * `indexRoot`. */
  def start(lines: DataFrame, linesDir: String, indexRoot: String,
            checkpointDir: String, keepEpochs: Int = 2,
            compactEvery: Int = 32,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, linesDir, indexRoot, batchId, keepEpochs,
          compactEvery)
      }
      .start()

  /** [[start]] against a TIERED root — [[foldBatchTiered]] per batch;
    * pair with [[GraphServeStream.startTiered]] for serving. */
  def startTiered(lines: DataFrame, linesDir: String, indexRoot: String,
                  checkpointDir: String, majorEvery: Int = 8,
                  compactEvery: Int = 32,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatchTiered(batch, linesDir, indexRoot, batchId, majorEvery,
          compactEvery)
        ()
      }
      .start()
}
