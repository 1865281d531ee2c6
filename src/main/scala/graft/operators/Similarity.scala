package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[cosineTopK]]: exact brute force — broadcast the (small) query set
  *    against the candidate corpus; one pass, no shuffle of the corpus.
  *    The right baseline, and often the right answer when queries ≪ corpus.
  *  - [[lshCosineTopK]]: random-hyperplane LSH — candidates restricted to
  *    matching sign-pattern buckets, so the corpus is probed via a bucket
  *    equi-join instead of a full scan per query. The scale path: corpus
  *    bucketing is a single hash shuffle, reusable across query batches.
  *
  * All arithmetic is double-precision built-in expressions (codegen'd
  * higher-order functions), no UDFs.
  */
object Similarity {

  /** Cast a float array to double for stable arithmetic. */
  private def dbl(c: Column): Column = transform(c, x => x.cast("double"))

  /** Interpreted reference formulation of the dot product (higher-order
    * functions; excluded from codegen — kept for double-array inputs and as
    * the semantic spec for [[graft.plans.FloatDotProduct]]). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Codegen'd dot product over float arrays — the hot kernel. Requires
    * [[graft.plans.FloatDotProduct.register]] on the session (operators
    * below do it). Bit-identical to `dotHof(dbl(a), dbl(b))`. */
  def dot(a: Column, b: Column): Column = call_function("float_dot", a, b)

  def norm(v: Column): Column = sqrt(dotHof(dbl(v), dbl(v)))

  def cosine(a: Column, b: Column): Column =
    dotHof(dbl(a), dbl(b)) / (norm(a) * norm(b))

  /** Per-query top-k of `scored` (qid, nid, score, …) by (score DESC, nid
    * ASC), through the bounded-heap [[graft.plans.TopK]] operator instead
    * of a row_number window: the window formulation SORTS every query's
    * full candidate set (the whole corpus for the exact ranker), where the
    * heap does O(n log k) compares and its partial pass below the exchange
    * caps the shuffle at k rows per (input partition × query). The rank
    * column is then a window over only the ≤ k×queries survivors. The
    * (score, nid) order is total per qid — nid is unique per query — so
    * the result is exactly the window formulation's (TopKPerKeySpec pins
    * the operator-level parity; v01/v02/v04/v08 stay hash-exact). */
  private def rankTopK(scored: DataFrame, scoreCol: String, k: Int): DataFrame = {
    val top = graft.plans.TopK.perKey(
      scored, Seq("qid"), Seq(scoreCol -> false, "nid" -> true), k)
    val w = Window.partitionBy("qid").orderBy(col(scoreCol).desc, col("nid"))
    top.withColumn("rank", row_number().over(w))
      .select(col("qid"), col("rank"), col("nid"), col(scoreCol))
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param queries   (qid, qv) — small enough to broadcast
    * @param corpus    (nid, nv) — arbitrarily large
    */
  def cosineTopK(queries: DataFrame, qid: String, qvec: String,
                 corpus: DataFrame, nid: String, nvec: String, k: Int): DataFrame = {
    graft.plans.FloatDotProduct.register(queries.sparkSession)
    val q = queries.select(col(qid).as("qid"), col(qvec).cast("array<float>").as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val c = corpus.select(col(nid).as("nid"), col(nvec).cast("array<float>").as("nv"))
      .withColumn("nn", sqrt(dot(col("nv"), col("nv"))))
    rankTopK(
      broadcast(q).join(c, col("qid") =!= col("nid"))
        .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn"))),
      "sim", k)
  }

  /** Exact top-k by MAXIMUM INNER PRODUCT (un-normalized dot) — the
    * retrieval semantics of learned two-tower / recommendation scorers,
    * where a vector's magnitude is part of its score. Ranking differs from
    * [[cosineTopK]] whenever corpus norms vary; same scale shape: the
    * query side broadcasts, the corpus streams map-side through the
    * codegen'd dot kernel, and the bounded heap caps the shuffle at k rows
    * per (partition × query). */
  def mipsTopK(queries: DataFrame, qid: String, qvec: String,
               corpus: DataFrame, nid: String, nvec: String, k: Int): DataFrame = {
    graft.plans.FloatDotProduct.register(queries.sparkSession)
    val q = queries.select(col(qid).as("qid"), col(qvec).cast("array<float>").as("qv"))
    val c = corpus.select(col(nid).as("nid"), col(nvec).cast("array<float>").as("nv"))
    rankTopK(
      broadcast(q).join(c, col("qid") =!= col("nid"))
        .withColumn("ip", dot(col("qv"), col("nv"))),
      "ip", k)
  }

  /** SQ8 (int8 scalar-quantized) top-k by inner product — the remaining
    * standard quantization tier beside PQ-ADC ([[ivfPqProbe]]) and binary
    * Hamming ([[hammingRerankTopK]]): each vector is quantized ONCE to
    * per-component integers q_i = round(x_i·127/maxabs) with its single
    * per-vector scale, the candidate scan scores with an exact INTEGER
    * dot (the SIMD-friendly kernel an SQ8 index runs), and the true
    * inner-product estimate comes back from one per-pair rescale
    * q_dot·s_a·s_c/127². 4 bytes/dim shrinks to 1 — the memory-bandwidth
    * win that makes SQ8 the default middle tier between full-precision
    * and PQ.
    *
    * Determinism: quantization is a map (round is away-from-zero on
    * midpoints in both engines), the dot is exact long arithmetic
    * (order-free), and the rescale is one fixed-shape double product, so
    * the whole ranker replays bit-for-bit in the oracle. Same scale shape
    * as [[mipsTopK]]: queries broadcast, corpus streams map-side, the
    * bounded heap caps the shuffle at k rows per (partition × query).
    * A zero vector quantizes to all-zero codes with scale 0 (no NaN). */
  def sq8TopK(queries: DataFrame, qid: String, qvec: String,
              corpus: DataFrame, nid: String, nvec: String, k: Int): DataFrame = {
    def quant(df: DataFrame, id: String, vc: String,
              idAs: String, qAs: String, sAs: String): DataFrame =
      df.select(col(id).as(idAs), col(vc).cast("array<double>").as("__v"))
        .withColumn(sAs, array_max(transform(col("__v"), x => abs(x))))
        .withColumn(qAs,
          when(col(sAs) === 0.0, transform(col("__v"), _ => lit(0L)))
            .otherwise(transform(col("__v"),
              x => round(x * lit(127.0) / col(sAs), 0).cast("long"))))
        .drop("__v")
    val q = quant(queries, qid, qvec, "qid", "qq", "qs")
    val c = quant(corpus, nid, nvec, "nid", "nq", "ns")
    rankTopK(
      broadcast(q).join(c, col("qid") =!= col("nid"))
        .withColumn("q_dot",
          aggregate(zip_with(col("qq"), col("nq"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x))
        .withColumn("score",
          col("q_dot").cast("double") * col("qs") * col("ns") / lit(16129.0))
        .drop("qq", "nq"),
      "score", k)
  }

  /** Distributed Lloyd's iterations for a coarse k-means quantizer.
    *
    * Per iteration: every sample row is assigned to its nearest centroid
    * with the codegen'd [[cellScores]] argmax (a map-only pass — centroids
    * are literals, i.e. broadcast), and new centroids come back from ONE
    * partial-aggregating groupBy over (cell, dim). Only the model (nCells ×
    * dim means) ever reaches the driver; the sample itself never does, so
    * the same code trains on 10k rows locally or 10M rows on a cluster.
    *
    * Determinism: double sums depend on reduction order, so means are
    * computed in fixed-point (per-element `round(x·2^20)` summed as longs —
    * exact, order-independent, ±1e-6 is far below quantizer precision).
    * Fixed-point range check: |x|·2^20 per element, summed over the sample
    * → overflows long only past ~8.8e12·Σ|x|, unreachable for unit-scale
    * embeddings and bounded samples. */
  private def lloydsCentroids(sample: DataFrame, vecCol: String, nCells: Int,
                              iters: Int, init: Array[Array[Double]]): Array[Array[Double]] = {
    val scale = (1L << 20).toDouble
    var centroids = init
    for (_ <- 1 to iters) {
      val stats = sample
        .withColumn("cell", nearestCell(col(vecCol), centroids))
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg((sum(round(col("x") * scale).cast("long")).cast("double")
          / count(lit(1)) / scale).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      stats.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next // cells that captured no points keep their old center
    }
    centroids
  }

  /** Per-cell nearness scores of vector `v` against literal `centroids`,
    * as (score, cellId) structs whose argmax is the nearest cell:
    * |v−c|² = |v|² − 2v·c + |c|², and |v|² is constant per row, so
    * arg-min distance ≡ arg-max (v·c − |c|²/2) — one codegen'd dot each. */
  private def cellScores(v: Column, centroids: Array[Array[Double]]): Seq[Column] = {
    val centroidLit = typedLit(centroids.map(_.map(_.toFloat).toSeq).toSeq)
    centroids.indices.map { c =>
      val cNorm2 = centroids(c).map(x => x * x).sum
      struct((dot(v, centroidLit.getItem(c)) - lit(cNorm2 / 2)).as("s"),
             lit(c).as("c"))
    }
  }

  /** Arg-max cell of `v` under `centroids` — `greatest` needs ≥ 2 args,
    * and a degenerate 1-centroid quantizer (corpus smaller than nCells)
    * must still assign rather than fail analysis. */
  private def nearestCell(v: Column, centroids: Array[Array[Double]]): Column = {
    val ss = cellScores(v, centroids)
    (if (ss.size == 1) ss.head else greatest(ss: _*)).getField("c")
  }

  /** A built IVF index: the trained coarse quantizer plus the cell-assigned
    * corpus. Build once ([[ivfBuild]]), probe many times ([[ivfProbe]]) —
    * training (8 driver round-trips of Lloyd's) and the corpus assignment
    * pass happen once per index, not once per query batch. `release()`
    * unpersists the assignment when the index is retired. */
  final case class IvfIndex(centroids: Array[Array[Double]], nCells: Int,
                            assigned: DataFrame, release: () => Unit)

  /** The ONE cell-assignment pass shared by [[ivfBuild]], [[ivfAppend]]
    * and the tiered vector roll's L0 minors: `(nid, nv, cell, nn)` under
    * LITERAL centroids — a broadcast-map projection (cell scores are
    * literals: no shuffle, no training, no driver data motion, work
    * linear in the batch). The returned frame is exactly the shape
    * [[IvfIndex.assigned]] holds, so tiers assigned under the same
    * centroids union into a probeable index without re-assignment. */
  def assignCells(batch: DataFrame, nid: String, nvec: String,
                  centroids: Array[Array[Double]]): DataFrame = {
    graft.plans.FloatDotProduct.register(batch.sparkSession)
    batch.select(col(nid).as("nid"), col(nvec).cast("array<float>").as("nv"))
      .withColumn("cell", nearestCell(col("nv"), centroids))
      .withColumn("nn", sqrt(dot(col("nv"), col("nv"))))
  }

  /** Train the coarse quantizer and assign the corpus to cells.
    *
    * Centroid training is distributed ([[lloydsCentroids]] — assignment
    * map-side, means via one groupBy per iteration; only the nCells×dim
    * model reaches the driver) and deterministic: the sample is pinned by a
    * total order on the id, initialization spreads over the sample in
    * multiplicative-hash order (`Splits.ringHash` — a deterministic
    * pseudo-random spread that plain head-of-id order lacks, overflow-proof
    * for any long id, and closed-form arithmetic the DuckDB oracle
    * reproduces exactly, which xxhash64 was not; ids must be numeric —
    * hash string ids to longs upstream), and iteration means use
    * order-independent fixed-point sums. Cell assignment is one broadcast-map pass over the
    * corpus; with `persist=true` the assignment (and its shuffle) is
    * computed once and reused by every subsequent [[ivfProbe]].
    */
  def ivfBuild(corpus: DataFrame, nid: String, nvec: String,
               nCells: Int = 16, trainSample: Int = 10000, iters: Int = 8,
               persist: Boolean = true): IvfIndex = {
    val spark = corpus.sparkSession
    graft.plans.FloatDotProduct.register(spark)

    // --- bounded, deterministically-pinned training sample (an unordered
    // limit() would be partition-layout-dependent); persisted because each
    // Lloyd's iteration re-reads it
    val sample = corpus
      .select(col(nid).cast("long").as("__sid"), col(nvec).cast("array<float>").as("__sv"))
      .orderBy("__sid").limit(trainSample)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val init = sample
      .orderBy(Splits.ringHash(col("__sid")), col("__sid"))
      .limit(nCells)
      .select(col("__sv")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(init.nonEmpty, "corpus is empty")
    val centroids = lloydsCentroids(sample, "__sv", nCells, iters, init)
    sample.unpersist()

    val assigned = {
      val a = assignCells(corpus, nid, nvec, centroids)
      if (persist) a.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else a
    }
    // the ACTUAL centroid count, not the requested nCells: a corpus
    // smaller than nCells trains fewer cells, and recording the request
    // would make every durable-store load fail its centroid-count check
    IvfIndex(centroids, centroids.length, assigned,
      () => { if (persist) { assigned.unpersist(); () } })
  }

  /** Probe a built [[IvfIndex]]: each query ranks only the candidates in
    * its `nProbe` nearest cells by exact cosine. Pure plan construction —
    * zero Spark jobs until the caller acts on the result, and never any
    * re-training (asserted in SimilaritySpec). */
  def ivfProbe(index: IvfIndex, queries: DataFrame, qid: String, qvec: String,
               k: Int, nProbe: Int = 4): DataFrame = {
    graft.plans.FloatDotProduct.register(queries.sparkSession)
    // nProbe nearest cells for a query: rank the per-cell scores, take top n
    def probeCells(v: Column): Column =
      slice(reverse(array_sort(array(cellScores(v, index.centroids): _*))), 1, nProbe)
    val q = queries.select(col(qid).as("qid"), col(qvec).cast("array<float>").as("qv"))
      .withColumn("cell", explode(probeCells(col("qv")).getField("c")))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    rankTopK(
      broadcast(q).join(index.assigned, Seq("cell"))
        .filter(col("qid") =!= col("nid"))
        .dropDuplicates("qid", "nid")
        .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn"))),
      "sim", k)
  }

  /** IVF (inverted-file) approximate top-k: the corpus is coarsely
    * quantized to `nCells` k-means centroids; each query probes only the
    * `nProbe` nearest cells and ranks those candidates by exact cosine.
    *
    * One-shot convenience over [[ivfBuild]] + [[ivfProbe]] (assignment not
    * persisted — a single probe reads it once). Query-heavy workloads
    * should build the index once and probe it per batch; see [[IvfIndex]].
    * Complements [[lshCosineTopK]]: IVF adapts to the data distribution
    * where hyperplane LSH is data-oblivious.
    */
  def ivfTopK(queries: DataFrame, qid: String, qvec: String,
              corpus: DataFrame, nid: String, nvec: String,
              k: Int, nCells: Int = 16, nProbe: Int = 4,
              trainSample: Int = 10000, iters: Int = 8): DataFrame =
    ivfProbe(ivfBuild(corpus, nid, nvec, nCells, trainSample, iters, persist = false),
      queries, qid, qvec, k, nProbe)

  /** Append a vector batch to a built [[IvfIndex]] WITHOUT retraining —
    * the index-maintenance half of the build/probe split (the vector twin
    * of [[graft.operators.Dedup.SignatureIndex]] for signatures): new
    * corpus versions arrive continuously, and re-running Lloyd's per batch
    * would cost 8 driver round-trips plus a full corpus re-assignment.
    * Instead the batch is assigned to the EXISTING centroids in one
    * broadcast-map pass (cell scores are literals — no shuffle, no driver
    * data motion, work linear in the batch), and the appended index serves
    * probes over base ∪ batch immediately.
    *
    * The trade is the standard IVF drift contract: centroids stop being
    * the k-means optimum of the grown corpus, degrading recall gradually
    * as the appended fraction grows — production re-trains at a drift
    * threshold (e.g. appended > ~30% of base) during a maintenance window.
    * Probe results over the appended index are EXACTLY what a fresh
    * assignment under the same centroids would produce (asserted in
    * SimilaritySpec; replayed end-to-end by v12's oracle).
    *
    * The returned index owns its base: `release()` frees the appended
    * assignment and then the base index's. Chain appends freely — each
    * layer unions one more persisted batch. */
  def ivfAppend(index: IvfIndex, batch: DataFrame, nid: String, nvec: String,
                persist: Boolean = true): IvfIndex = {
    val a = assignCells(batch, nid, nvec, index.centroids)
    val appended =
      if (persist) a.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else a
    IvfIndex(index.centroids, index.nCells,
      index.assigned.unionByName(appended),
      () => { if (persist) { appended.unpersist(); () }; index.release() })
  }

  /** Probe an [[IvfIndex]] with a TOMBSTONE set excluded — the deletion
    * half of index maintenance ([[ivfAppend]] is the insertion half):
    * GDPR erasure / corpus retractions mark ids dead, and rebuilding a
    * 100-TB index per delete batch is not an option. Tombstoned rows are
    * anti-joined out of the assigned corpus BEFORE ranking, so every
    * query still returns k live results (filtering after the top-k would
    * silently return fewer). The tombstone set is typically tiny →
    * broadcast anti-join, zero extra shuffle of the corpus; production
    * compacts the index (physically dropping dead rows) when tombstones
    * pass a threshold, exactly like the ivfAppend retrain contract. */
  def ivfProbeExcluding(index: IvfIndex, tombstones: DataFrame, tombId: String,
                        queries: DataFrame, qid: String, qvec: String,
                        k: Int, nProbe: Int = 4): DataFrame = {
    val dead = broadcast(tombstones.select(col(tombId).as("nid")).distinct())
    val live = index.assigned.join(dead, Seq("nid"), "left_anti")
    ivfProbe(index.copy(assigned = live), queries, qid, qvec, k, nProbe)
  }

  /** Shared kernel of the three `*Compact` maintenance ops: one scan of
    * the stored frame (left join against the broadcast tombstone set)
    * counts total and dead rows together, then — when the dead share
    * reaches `threshold` — the survivors are anti-joined out, persisted
    * and materialized. Returns `None` when there is nothing to do (no
    * dead rows stored, or share below threshold): the caller keeps
    * serving the old index with query-time exclusion. The decision scan
    * is one pass over the stored rows; the rewrite is a second — both
    * O(index), paid ONCE in a maintenance window instead of a broadcast
    * anti-join on every query forever. */
  private def compactFrame(stored: DataFrame, tombstones: DataFrame,
                           tombId: String, threshold: Double,
                           persist: Boolean): Option[(DataFrame, () => Unit)] = {
    val dead = broadcast(
      tombstones.select(col(tombId).as("nid")).distinct()
        .withColumn("is_dead", lit(1)))
    val counted = stored.select("nid").join(dead, Seq("nid"), "left")
      .agg(count(lit(1)).as("n_total"),
        sum(coalesce(col("is_dead"), lit(0))).as("n_dead"))
      .head()
    val nTotal = counted.getLong(0)
    val nDead = if (counted.isNullAt(1)) 0L else counted.getLong(1)
    if (nDead == 0L || (nTotal > 0 && nDead.toDouble / nTotal < threshold))
      None
    else {
      val live0 = stored.join(dead.select("nid"), Seq("nid"), "left_anti")
      val live =
        if (persist) live0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else live0
      if (persist) live.count()
      Some((live, () => { if (persist) { live.unpersist(); () }; () }))
    }
  }

  /** PHYSICAL tombstone compaction for the IVF family — the maintenance-
    * window op [[ivfProbeExcluding]]'s scaladoc promises ("production
    * compacts the index when tombstones pass a threshold"): dead rows
    * are dropped from the assigned frame ONCE and the returned index
    * carries no tombstone debt — probing it PLAIN ≡ probing the original
    * with the exclusion ≡ rebuilding the index without the dead rows
    * (assignment under fixed centroids commutes with row deletion — the
    * v12 identity run backwards; the centroids are untouched, so no
    * retrain and no re-encode anywhere). `None` below `threshold` (dead
    * share of stored rows) — keep excluding at query time until the debt
    * justifies the rewrite. The returned index owns its persisted
    * survivor frame; `release()` frees it, then the base's. */
  def ivfCompact(index: IvfIndex, tombstones: DataFrame, tombId: String,
                 threshold: Double = 0.0,
                 persist: Boolean = true): Option[IvfIndex] =
    compactFrame(index.assigned, tombstones, tombId, threshold, persist)
      .map { case (live, rel) =>
        index.copy(assigned = live,
          release = () => { rel(); index.release() })
      }

  /** [[ivfCompact]] for the PQ family: dead rows dropped from the coded
    * frame, codebooks untouched (encoding under fixed codebooks commutes
    * with deletion — v24's identity backwards). Post-compaction
    * [[pqTopK]] ≡ [[pqTopKExcluding]] on the original ≡ rebuild-encode
    * without the dead rows. */
  def pqCompact(index: PqIndex, tombstones: DataFrame, tombId: String,
                threshold: Double = 0.0,
                persist: Boolean = true): Option[PqIndex] =
    compactFrame(index.encoded, tombstones, tombId, threshold, persist)
      .map { case (live, rel) =>
        index.copy(encoded = live,
          release = () => { rel(); index.release() })
      }

  /** [[ivfCompact]] for the composed IVFADC index: dead rows dropped
    * from the coded frame, BOTH models untouched. Post-compaction
    * [[ivfPqProbe]] ≡ [[ivfPqProbeExcluding]] on the original ≡
    * rebuild-encode without the dead rows (v34's oracle certifies the
    * full chain). */
  def ivfPqCompact(index: IvfPqIndex, tombstones: DataFrame, tombId: String,
                   threshold: Double = 0.0,
                   persist: Boolean = true): Option[IvfPqIndex] =
    compactFrame(index.coded, tombstones, tombId, threshold, persist)
      .map { case (live, rel) =>
        index.copy(coded = live,
          release = () => { rel(); index.release() })
      }

  /** Centroid-drift audit — the REBUILD TRIGGER the [[ivfAppend]] contract
    * promises ("production re-trains at a drift threshold") but nothing
    * measured until now. A fresh arrival batch is assigned to the EXISTING
    * centroids (one broadcast-map pass, no training), and each cell
    * compares its share of the batch against its share of the index: a
    * cell whose new-data share deviates from its index share by more than
    * 50% relative is `drifted` — integer cross-multiplication
    * (2·|n_new·N_idx − n_idx·N_new| > n_idx·N_new), no float thresholds,
    * so the verdict replays exactly in a SQL oracle. Cost: one pass over
    * the batch + one aggregate over the (persisted) assignment; totals
    * ride the broadcast single-row scalar idiom. A maintenance job runs
    * this per ingest and triggers retraining when drifted cells pass a
    * count threshold. */
  def driftAudit(index: IvfIndex, batch: DataFrame,
                 nid: String, nvec: String): DataFrame = {
    graft.plans.FloatDotProduct.register(batch.sparkSession)
    val b = batch.select(col(nid).as("nid"), col(nvec).cast("array<float>").as("nv"))
      .withColumn("cell", nearestCell(col("nv"), index.centroids))
    val idx = index.assigned.groupBy("cell").agg(count(lit(1)).as("n_idx"))
    val bat = b.groupBy("cell").agg(count(lit(1)).as("n_new"))
    val tot = index.assigned.agg(count(lit(1)).as("n_tot"))
    val btot = batch.agg(count(lit(1)).as("n_btot"))
    // FULL join: a cell empty in the standing index but receiving batch
    // mass is the STRONGEST drift signal — a left join from the index
    // side would silently drop exactly those rows (review catch)
    idx.join(bat, Seq("cell"), "full")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(btot))
      .select(col("cell").cast("long").as("cell"),
        coalesce(col("n_idx"), lit(0L)).as("n_idx"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        // greatest(,1): an EMPTY index/batch reports zero shares instead
        // of NULL-from-division; with n_btot=0 every n_new is 0 too, so
        // no verdict can fire — the audit degrades to all-clear, loudly
        // visible via n_new=0 everywhere
        call_function("div", coalesce(col("n_idx"), lit(0L)) * 1000,
          greatest(col("n_tot"), lit(1L))).as("idx_share_pm"),
        call_function("div", coalesce(col("n_new"), lit(0L)) * 1000,
          greatest(col("n_btot"), lit(1L))).as("new_share_pm"),
        // n_idx=0 with n_new>0 ⇒ LHS positive, RHS 0 ⇒ drifted, as it
        // must be: fresh mass in an index-empty cell is definitional drift
        (lit(2) * abs(coalesce(col("n_new"), lit(0L)) * col("n_tot") -
          coalesce(col("n_idx"), lit(0L)) * col("n_btot")) >
          coalesce(col("n_idx"), lit(0L)) * col("n_btot"))
          .as("drifted"))
      .orderBy("cell")
  }

  /** Metadata-FILTERED IVF probe — the approximate counterpart of
    * [[filteredCosineTopK]] and the path a 100-TB per-tenant/per-language
    * ANN actually runs: each query probes its `nProbe` nearest cells and
    * ranks only candidates matching it on `filterKeys`. The filter rides
    * the hash JOIN (cell + filter keys), so mismatched candidates are
    * discarded by the probe, never scored.
    *
    * `meta` supplies the filter columns for corpus ids (at scale these are
    * stored as index columns at build time; here they attach with one hash
    * join on the id). RECALL CAVEAT — the reason v17 exists: the filter
    * composes with cell probing, so when a probed cell holds few (or no)
    * rows of the query's filter value, fewer than k matches may surface
    * even though the corpus has k good ones elsewhere. Filtered probes can
    * therefore lose recall beyond plain-IVF's (v09's audit cannot see
    * this); audit per filter value with v17's pattern and raise `nProbe`
    * for decimated values. */
  def ivfProbeFiltered(index: IvfIndex, meta: DataFrame, metaId: String,
                       queries: DataFrame, qid: String, qvec: String,
                       filterKeys: Seq[String], k: Int, nProbe: Int = 4): DataFrame = {
    require(filterKeys.nonEmpty, "use ivfProbe when there is no filter")
    graft.plans.FloatDotProduct.register(queries.sparkSession)
    val assigned = index.assigned.join(
      meta.select((col(metaId).as("nid") +: filterKeys.map(col)): _*), Seq("nid"))
    def probeCells(v: Column): Column =
      slice(reverse(array_sort(array(cellScores(v, index.centroids): _*))), 1, nProbe)
    val q = queries.select(
      (Seq(col(qid).as("qid"), col(qvec).cast("array<float>").as("qv")) ++
        filterKeys.map(col)): _*)
      .withColumn("cell", explode(probeCells(col("qv")).getField("c")))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    rankTopK(
      broadcast(q).join(assigned, Seq("cell") ++ filterKeys)
        .filter(col("qid") =!= col("nid"))
        .dropDuplicates("qid", "nid")
        .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn"))),
      "sim", k)
  }

  /** A built product-quantization index: per-subspace codebooks plus the
    * code-compressed corpus. `codebooks(m)(c)` is subspace `m`'s centroid
    * `c` (subDim doubles); `encoded` carries ONLY (nid, code_0..code_{m-1})
    * — m·⌈log₂k⌉ bits of payload per vector instead of dim floats, the
    * memory shape that lets a 100-TB corpus's scan side fit a cluster's
    * RAM. Build once ([[pqBuild]]), probe many times ([[pqTopK]]);
    * `release()` unpersists the encoding when the index is retired. */
  final case class PqIndex(codebooks: Array[Array[Array[Double]]],
                           m: Int, k: Int, subDim: Int,
                           encoded: DataFrame, release: () => Unit)

  /** Train per-subspace codebooks and encode the corpus (product
    * quantization, Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011): the vector is split into `m`
    * contiguous subspaces of dim/m dims, each quantized independently by
    * its own k-means codebook — k^m effective cells from m·k trained
    * centroids.
    *
    * Training reuses the IVF discipline per subspace ([[lloydsCentroids]]
    * on the sliced sample — distributed, deterministic: sample pinned by
    * id order, init spread in `Splits.ringHash` order, fixed-point means),
    * so the DuckDB oracle replays all m trainings exactly (v08). Encoding
    * is one map-only pass: per subspace an argmax over k codegen'd dots
    * with the codebook as a literal (broadcast), no shuffle. */
  def pqBuild(corpus: DataFrame, nid: String, nvec: String, dim: Int,
              m: Int = 4, k: Int = 8, iters: Int = 4,
              trainSample: Int = 10000, persist: Boolean = true,
              trainTimeoutSec: Long = 3600L): PqIndex = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into $m even subspaces")
    require(trainTimeoutSec > 0, s"trainTimeoutSec must be positive, got $trainTimeoutSec")
    graft.plans.FloatDotProduct.register(corpus.sparkSession)
    val subDim = dim / m
    val sample = corpus
      .select(col(nid).cast("long").as("__sid"), col(nvec).cast("array<float>").as("__sv"))
      .orderBy("__sid").limit(trainSample)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The m subspace trainings are independent — run them CONCURRENTLY
    // (concurrent actions over the shared persisted sample are safe and
    // the scheduler interleaves their jobs), so build latency is one
    // training, not m sequential ones. Results are deterministic either
    // way: each subspace's Lloyd's chain touches only its own slice.
    // A DEDICATED daemon pool with a BOUNDED await, not the global pool
    // with Duration.Inf: a training wedged on a sick executor must fail
    // this build with a timeout, not silently hold global-pool threads
    // (and the session) hostage forever.
    import scala.concurrent.{Await, ExecutionContext, Future}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(m,
      (r: Runnable) => {
        val t = new Thread(r, "graft-pq-train"); t.setDaemon(true); t
      })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val codebooks = try Await.result(
      Future.sequence((0 until m).toList.map { ms => Future {
        val sliced = sample.select(col("__sid"),
          slice(col("__sv"), ms * subDim + 1, subDim).as("__sv"))
        val init = sliced
          .orderBy(Splits.ringHash(col("__sid")), col("__sid"))
          .limit(k)
          .select(col("__sv")).collect()
          .map(_.getSeq[Float](0).map(_.toDouble).toArray)
        require(init.nonEmpty, "corpus is empty")
        lloydsCentroids(sliced, "__sv", k, iters, init)
      }}),
      scala.concurrent.duration.Duration(trainTimeoutSec,
        java.util.concurrent.TimeUnit.SECONDS)).toArray
    finally {
      pool.shutdownNow()
      // in the finally, not after: a timed-out build must not leave the
      // persisted training sample pinned for the session's lifetime
      sample.unpersist(); ()
    }
    val encoded = {
      val withCodes = encodeWith(codebooks, subDim, corpus, nid, nvec)
      if (persist) withCodes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else withCodes
    }
    // actual per-subspace codebook size (see the IvfIndex note): a tiny
    // corpus trains fewer than k codes per subspace
    PqIndex(codebooks, m, codebooks.head.length, subDim, encoded,
      () => { if (persist) { encoded.unpersist(); () } })
  }

  /** PQ asymmetric-distance top-k: a candidate's score against query `q`
    * is Σ_m q_m · c_{m,code_m} — the ADC approximation of the dot product
    * (the query stays full-precision; only the corpus is quantized). Pure
    * plan construction over the prebuilt index, like [[ivfProbe]]: the
    * corpus side touches only the integer codes, never the original
    * vectors — at scale the scan reads m small ints per row and the
    * codebook dots are literals in codegen. Exact re-ranking of the ADC
    * top-k against the raw vectors is the standard refinement when recall
    * at rank matters; it composes as [[cosineTopK]] over the ADC
    * survivors. */
  def pqTopK(index: PqIndex, queries: DataFrame, qid: String, qvec: String,
             k: Int): DataFrame = {
    graft.plans.FloatDotProduct.register(queries.sparkSession)
    val q = queries.select(col(qid).as("qid"), col(qvec).cast("array<float>").as("qv"))
    val adc = (0 until index.m).map { ms =>
      val cb = typedLit(index.codebooks(ms).map(_.map(_.toFloat).toSeq).toSeq)
      dot(slice(col("qv"), ms * index.subDim + 1, index.subDim),
        element_at(cb, col(s"code_$ms") + 1))
    }.reduceLeft(_ + _) // fixed left-to-right subspace order, oracle-identical
    rankTopK(
      broadcast(q).join(index.encoded, col("qid") =!= col("nid"))
        .withColumn("adc", adc),
      "adc", k)
  }

  /** Encode a fresh batch under the STANDING codebooks — PQ's insertion
    * half, [[ivfAppend]]'s twin (r11 verdict: the PQ index was
    * build-once-only while IVF had append + drift + a streaming roll).
    * One map-only pass per subspace (argmax over k codegen'd dots with
    * the codebook as a literal — the same kernel [[pqBuild]] encodes
    * with), NO training: at 100 TB a codebook retrain is a maintenance
    * window, not an ingest step. Appended codes are immediately
    * searchable by [[pqTopK]]. The returned index owns its base:
    * `release()` frees the appended codes and then the base's. Chain
    * appends freely — each layer unions one more persisted batch.
    * Encode-under-standing is deterministic, so append ≡ rebuild
    * assignment EXACTLY while the codebooks still fit the data; when the
    * corpus drifts, [[pqDriftAudit]] is the retrain trigger. */
  def pqAppend(index: PqIndex, batch: DataFrame, nid: String, nvec: String,
               persist: Boolean = true): PqIndex =
    pqAppendCoded(index, pqEncode(index, batch, nid, nvec), persist)

  /** [[pqAppend]] over an ALREADY-ENCODED batch (a [[pqEncode]] result):
    * callers that also audit the same batch encode ONCE and feed both
    * paths (PqEpochStream does) instead of paying the |Δ| argmax pass
    * twice. With `persist = false` the caller owns `coded`'s lifecycle;
    * the returned release then frees only the base chain. */
  def pqAppendCoded(index: PqIndex, coded: DataFrame,
                    persist: Boolean = true): PqIndex = {
    val appended =
      if (persist) coded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else coded
    index.copy(encoded = index.encoded.unionByName(appended),
      release = () => { if (persist) { appended.unpersist(); () }; index.release() })
  }

  /** Encode `batch` under `index`'s standing codebooks — the shared |Δ|
    * pass behind [[pqAppendCoded]] and [[pqDriftAuditCoded]]:
    * `(nid, code_0..code_{m-1})`, [[pqBuild]]'s exact corpus-encode
    * arithmetic. */
  def pqEncode(index: PqIndex, batch: DataFrame,
               nid: String, nvec: String): DataFrame = {
    graft.plans.FloatDotProduct.register(batch.sparkSession)
    encodeUnderCodebooks(index, batch, nid, nvec)
  }

  /** [[pqEncode]] against RAW codebooks (no [[PqIndex]] handle) — the
    * tiered PQ roll's minor path holds only the model
    * ([[graft.operators.IndexStore.loadPqCodebooks]]), never the standing
    * encoded frame. Same kernel, same determinism. */
  def pqEncodeWith(codebooks: Array[Array[Array[Double]]], subDim: Int,
                   batch: DataFrame, nid: String, nvec: String): DataFrame = {
    graft.plans.FloatDotProduct.register(batch.sparkSession)
    encodeWith(codebooks, subDim, batch, nid, nvec)
  }

  /** One map-only encode of `batch` under `index`'s codebooks:
    * `(nid, code_0..code_{m-1})`, the exact arithmetic of [[pqBuild]]'s
    * corpus encode (per-subspace argmax, (score DESC, cell DESC)
    * tie-break). */
  private def encodeUnderCodebooks(index: PqIndex, batch: DataFrame,
                                   nid: String, nvec: String): DataFrame =
    encodeWith(index.codebooks, index.subDim, batch, nid, nvec)

  /** The ONE PQ encode kernel — [[pqBuild]]'s corpus pass and every
    * encode-under-standing path run this same fold, so append ≡ rebuild
    * is an identity of code, not of two implementations. */
  private def encodeWith(codebooks: Array[Array[Array[Double]]], subDim: Int,
                         batch: DataFrame, nid: String, nvec: String): DataFrame =
    codebooks.indices.foldLeft(
      batch.select(col(nid).as("nid"), col(nvec).cast("array<float>").as("nv"))) {
      (a, ms) =>
        a.withColumn(s"code_$ms",
          nearestCell(slice(col("nv"), ms * subDim + 1, subDim), codebooks(ms)))
    }.drop("nv")

  /** Codebook-drift audit — [[driftAudit]]'s PQ twin and the RETRAIN
    * TRIGGER [[pqAppend]]'s contract promises: stale codebooks silently
    * degrade ADC recall as the corpus drifts, and nothing else measures
    * that. A fresh batch is encoded under the EXISTING codebooks (one
    * map pass, no training) and each (subspace, code) compares its share
    * of the batch against its share of the standing index with the same
    * integer cross-multiplication verdict as the IVF audit
    * (2·|n_new·N_idx − n_idx·N_new| > n_idx·N_new) — no float
    * thresholds, so the verdicts replay exactly in a SQL oracle. A
    * maintenance job retrains (full [[pqBuild]] over standing ∪ batch)
    * when drifted codes pass a count threshold. */
  def pqDriftAudit(index: PqIndex, batch: DataFrame,
                   nid: String, nvec: String): DataFrame =
    pqDriftAuditCoded(index, pqEncode(index, batch, nid, nvec))

  /** [[pqDriftAudit]] over an already-encoded batch — see
    * [[pqAppendCoded]] for the share-one-encode contract. */
  def pqDriftAuditCoded(index: PqIndex, coded: DataFrame): DataFrame = {
    def melt(df: DataFrame): DataFrame =
      (0 until index.m).map(ms => df.select(lit(ms).as("subspace"),
          col(s"code_$ms").cast("long").as("code")))
        .reduce(_ unionByName _)
    val idx = melt(index.encoded).groupBy("subspace", "code")
      .agg(count(lit(1)).as("n_idx"))
    val bat = melt(coded).groupBy("subspace", "code")
      .agg(count(lit(1)).as("n_new"))
    val tot = index.encoded.agg(count(lit(1)).as("n_tot"))
    val btot = coded.agg(count(lit(1)).as("n_btot")) // one row per batch vector
    // FULL join for the same reason as driftAudit's: batch mass in a code
    // the standing index never emitted is the strongest drift signal
    idx.join(bat, Seq("subspace", "code"), "full")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(btot))
      .select(col("subspace"), col("code"),
        coalesce(col("n_idx"), lit(0L)).as("n_idx"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        call_function("div", coalesce(col("n_idx"), lit(0L)) * 1000,
          greatest(col("n_tot"), lit(1L))).as("idx_share_pm"),
        call_function("div", coalesce(col("n_new"), lit(0L)) * 1000,
          greatest(col("n_btot"), lit(1L))).as("new_share_pm"),
        (lit(2) * abs(coalesce(col("n_new"), lit(0L)) * col("n_tot") -
          coalesce(col("n_idx"), lit(0L)) * col("n_btot")) >
          coalesce(col("n_idx"), lit(0L)) * col("n_btot"))
          .as("drifted"))
      .orderBy("subspace", "code")
  }

  /** A built IVFADC index (coarse IVF + product-quantized RESIDUALS —
    * Jégou et al., "Product Quantization for Nearest Neighbor Search",
    * TPAMI 2011 §IV, the production-standard composition of the two
    * quantizers above): the coarse quantizer routes, the residual
    * codebooks refine. `coded` holds `(nid, cell, code_0..code_{m-1})` —
    * m·⌈log₂k⌉ bits + one cell id per vector, and a probe touches only
    * the `nProbe` probed cells' rows, so the scan side is BOTH
    * memory-compressed (PQ) and candidate-pruned (IVF), which neither
    * index achieves alone. `release()` unpersists the coded corpus. */
  final case class IvfPqIndex(centroids: Array[Array[Double]], nCells: Int,
                              codebooks: Array[Array[Array[Double]]],
                              m: Int, k: Int, subDim: Int,
                              coded: DataFrame, release: () => Unit)

  /** Residuals of an assigned corpus against its (float-rounded, the
    * [[cellScores]] literal convention) coarse centroids — float
    * subtraction per element, so a SQL oracle replays it as
    * round-to-REAL of the exact double difference. */
  private def residuals(centroids: Array[Array[Double]],
                        assigned: DataFrame): DataFrame = {
    val centLit = typedLit(centroids.map(_.map(_.toFloat).toSeq).toSeq)
    assigned.select(col("nid"), col("cell"),
      zip_with(col("nv"), element_at(centLit, col("cell") + 1),
        (a, b) => a - b).as("rv"))
  }

  /** Train the IVFADC index: coarse quantizer ([[ivfBuild]]'s Lloyd's —
    * distributed, deterministic), then per-subspace codebooks over the
    * cell RESIDUALS ([[pqBuild]] on `nv − centroid[cell]` — residuals
    * concentrate near zero, which is why quantizing them beats
    * quantizing raw vectors at equal bit budget), then one map-only
    * encode. Training is the same deterministic discipline end-to-end
    * (id-ordered samples, ringHash init spread, fixed-point means), so
    * the DuckDB oracle replays the full chain exactly (v29). The coarse
    * assignment is released at return — probes need only the two small
    * models (literals in codegen) and the coded corpus. */
  def ivfPqBuild(corpus: DataFrame, nid: String, nvec: String, dim: Int,
                 nCells: Int = 8, m: Int = 4, k: Int = 8,
                 coarseIters: Int = 4, pqIters: Int = 4,
                 trainSample: Int = 10000, persist: Boolean = true): IvfPqIndex = {
    graft.plans.FloatDotProduct.register(corpus.sparkSession)
    val coarse = ivfBuild(corpus, nid, nvec, nCells, trainSample,
      coarseIters, persist = true)
    try {
      val resid = residuals(coarse.centroids, coarse.assigned)
      val pq = pqBuild(resid, "nid", "rv", dim, m, k, pqIters, trainSample,
        persist = false)
      val coded0 = pq.encoded
        .join(coarse.assigned.select(col("nid"), col("cell")), Seq("nid"))
      val coded =
        if (persist) coded0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else coded0
      if (persist) coded.count() // materialize before the assignment drops
      IvfPqIndex(coarse.centroids, coarse.nCells, pq.codebooks, pq.m, pq.k,
        pq.subDim, coded,
        () => { if (persist) { coded.unpersist(); () }; () })
    } finally coarse.release()
  }

  /** IVFADC probe: each query expands to its `nProbe` nearest coarse
    * cells and scores only those cells' candidates by the decomposed
    * inner-product estimate q·v̂ = q·c_cell + Σ_m q_m · c_{m,code_m}
    * (v̂ = coarse centroid + quantized residual; the q·c_cell term is one
    * dot per (query, probed cell), the residual sum is the usual ADC
    * lookup in the fixed left-to-right subspace order — [[pqTopK]]'s
    * contract, with the cell constant leading). The QUERY stays raw on
    * both terms — residualizing it and scoring qr·r̂ ranks correctly for
    * neither dot nor L2 (v30's recall audit caught exactly that in this
    * operator's first draft). The ADC tier itself is heavily lossy at
    * small code budgets (m·⌈log₂k⌉ bits/vector — v08-parity distortion,
    * measured honestly by v30 rather than asserted), which is why the
    * production shape is ADC-as-SHORTLIST → exact re-rank of survivors
    * (v30's second leg; [[rerankCosine]] for cosine semantics). Pure
    * plan construction: the corpus side reads m small ints + a cell id
    * per row in the probed cells only; both models ride as codegen
    * literals; a candidate lives in exactly one cell, so no cross-cell
    * dedup is needed. */
  def ivfPqProbe(index: IvfPqIndex, queries: DataFrame, qid: String,
                 qvec: String, k: Int, nProbe: Int = 2): DataFrame = {
    graft.plans.FloatDotProduct.register(queries.sparkSession)
    def probeCells(v: Column): Column =
      slice(reverse(array_sort(array(cellScores(v, index.centroids): _*))),
        1, nProbe)
    val centLit = typedLit(index.centroids.map(_.map(_.toFloat).toSeq).toSeq)
    val q = queries
      .select(col(qid).as("qid"), col(qvec).cast("array<float>").as("qv"))
      .withColumn("cell", explode(probeCells(col("qv")).getField("c")))
      .withColumn("cdot", dot(col("qv"), element_at(centLit, col("cell") + 1)))
      .select("qid", "cell", "qv", "cdot")
    val residualAdc = (0 until index.m).map { ms =>
      val cb = typedLit(index.codebooks(ms).map(_.map(_.toFloat).toSeq).toSeq)
      dot(slice(col("qv"), ms * index.subDim + 1, index.subDim),
        element_at(cb, col(s"code_$ms") + 1))
    }
    // cell constant first, then subspaces left-to-right — oracle-identical
    val adc = (col("cdot") +: residualAdc).reduceLeft(_ + _)
    rankTopK(
      broadcast(q).join(index.coded, Seq("cell"))
        .filter(col("qid") =!= col("nid"))
        .withColumn("adc", adc),
      "adc", k)
  }

  /** [[pqTopK]] with a TOMBSTONE set excluded — the deletion half of PQ
    * index maintenance, [[ivfProbeExcluding]]'s quantized twin: dead ids
    * are anti-joined out of the coded corpus BEFORE ranking, so every
    * query still returns k live results; the tombstone set is typically
    * tiny → broadcast anti-join, zero extra shuffle of the codes.
    * [[pqCompact]] physically drops the dead rows at a threshold and
    * retires the per-query anti-join. */
  def pqTopKExcluding(index: PqIndex, tombstones: DataFrame, tombId: String,
                      queries: DataFrame, qid: String, qvec: String,
                      k: Int): DataFrame = {
    val dead = broadcast(tombstones.select(col(tombId).as("nid")).distinct())
    val live = index.encoded.join(dead, Seq("nid"), "left_anti")
    pqTopK(index.copy(encoded = live), queries, qid, qvec, k)
  }

  /** [[ivfPqProbe]] with a TOMBSTONE set excluded — the deletion half for
    * the composed two-stage index (every family's maintenance story now
    * has insert + delete + drift + epochs/tiers): same broadcast
    * anti-join on the coded corpus before the coarse-pruned ADC rank. */
  def ivfPqProbeExcluding(index: IvfPqIndex, tombstones: DataFrame,
                          tombId: String, queries: DataFrame,
                          qid: String, qvec: String,
                          k: Int, nProbe: Int = 2): DataFrame = {
    val dead = broadcast(tombstones.select(col(tombId).as("nid")).distinct())
    val live = index.coded.join(dead, Seq("nid"), "left_anti")
    ivfPqProbe(index.copy(coded = live), queries, qid, qvec, k, nProbe)
  }

  /** Encode a fresh batch under an [[IvfPqIndex]]'s STANDING models —
    * IVFADC's |Δ| ingest kernel and the composition of the two existing
    * ones: [[assignCells]] routes the batch under the standing coarse
    * centroids (one broadcast-map pass), the float residuals against the
    * assigned centroid are taken with [[residuals]]' exact arithmetic,
    * and [[pqEncodeWith]]'s argmax encodes them under the standing
    * residual codebooks. No training anywhere — at 100 TB both model
    * retrains are maintenance windows, not ingest steps. Output is
    * [[IvfPqIndex.coded]]'s exact shape `(nid, cell, code_0..m-1)`. */
  def ivfPqEncode(index: IvfPqIndex, batch: DataFrame,
                  nid: String, nvec: String): DataFrame =
    ivfPqEncodeWith(index.centroids, index.codebooks, index.subDim,
      batch, nid, nvec)

  /** [[ivfPqEncode]] against RAW models (no [[IvfPqIndex]] handle) — the
    * tiered IVFADC roll's minor path holds only the two small models
    * ([[graft.operators.IndexStore.loadIvfPqModels]]), never the standing
    * coded frame. Same kernels, same determinism. */
  def ivfPqEncodeWith(centroids: Array[Array[Double]],
                      codebooks: Array[Array[Array[Double]]], subDim: Int,
                      batch: DataFrame, nid: String, nvec: String): DataFrame = {
    graft.plans.FloatDotProduct.register(batch.sparkSession)
    val assigned = assignCells(batch, nid, nvec, centroids)
    pqEncodeWith(codebooks, subDim,
        residuals(centroids, assigned), "nid", "rv")
      .join(assigned.select(col("nid"), col("cell")), Seq("nid"))
  }

  /** IVFADC's insertion half — [[ivfAppend]]/[[pqAppend]]'s twin for the
    * composed index (r13 verdict: IVF and PQ each had append + drift +
    * epochs + tiers while the production two-stage index was
    * build-once-only). Encode-under-standing is deterministic at BOTH
    * stages (fixed-quantizer assignment and encoding commute with
    * union), so append ≡ rebuild-under-the-same-models EXACTLY — the
    * v24/v12 identity, certified end-to-end by v31's oracle. Drift
    * monitoring composes from the existing halves: [[driftAudit]] on the
    * cell routing, [[pqDriftAudit]] on the residual codes. The returned
    * index owns its base: `release()` frees the appended codes, then the
    * base's. Chain appends freely. */
  def ivfPqAppend(index: IvfPqIndex, batch: DataFrame, nid: String, nvec: String,
                  persist: Boolean = true): IvfPqIndex = {
    val coded = ivfPqEncode(index, batch, nid, nvec)
    val appended =
      if (persist) coded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else coded
    index.copy(coded = index.coded.unionByName(appended),
      release = () => { if (persist) { appended.unpersist(); () }; index.release() })
  }

  /** Exact cosine re-rank of per-query candidate pairs — the refinement
    * stage after a quantized (PQ/IVF/LSH) candidate pass: `cands` is a
    * (qid, nid) frame, tiny relative to the corpus, so it BROADCASTS onto
    * the corpus-vector join; only candidate vectors are ever scored at
    * full precision. Composes with [[pqTopK]] as coarse-recall →
    * exact-precision, the standard two-stage ANN serving shape. */
  def rerankCosine(cands: DataFrame, queries: DataFrame, qid: String, qvec: String,
                   corpus: DataFrame, nid: String, nvec: String, k: Int): DataFrame = {
    graft.plans.FloatDotProduct.register(queries.sparkSession)
    val q = queries.select(col(qid).as("qid"), col(qvec).cast("array<float>").as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    // the corpus side stays a BARE (nid, vector) projection below the
    // join: cast/dot/sqrt placed here would run per CORPUS row before the
    // hash probe discards non-candidates — all full-precision arithmetic
    // happens ABOVE the join, on the ~k-per-query survivors only
    val c = corpus.select(col(nid).as("nid"), col(nvec).as("nv_raw"))
    rankTopK(
      broadcast(cands.select("qid", "nid").join(broadcast(q), "qid"))
        .join(c, "nid")
        .withColumn("nv", col("nv_raw").cast("array<float>"))
        .withColumn("nn", sqrt(dot(col("nv"), col("nv"))))
        .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn"))),
      "sim", k)
  }

  /** Metadata-FILTERED exact top-k: each query ranks only corpus vectors
    * matching it on `filterKeys` (per-tenant / per-language / per-shard
    * vector search — the filter is part of the JOIN, so non-matching
    * corpus rows are discarded by the hash probe before any dot product
    * runs, not scored and thrown away). At scale the corpus side can
    * additionally be PARTITIONED on the filter keys, turning the probe
    * into a partition-pruned scan; the broadcast query side and bounded-
    * heap ranking are [[cosineTopK]]'s. */
  def filteredCosineTopK(queries: DataFrame, qid: String, qvec: String,
                         corpus: DataFrame, nid: String, nvec: String,
                         filterKeys: Seq[String], k: Int): DataFrame = {
    require(filterKeys.nonEmpty, "use cosineTopK when there is no filter")
    graft.plans.FloatDotProduct.register(queries.sparkSession)
    val q = queries.select(
      (Seq(col(qid).as("qid"), col(qvec).cast("array<float>").as("qv")) ++
        filterKeys.map(col)): _*)
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val c = corpus.select(
      (Seq(col(nid).as("nid"), col(nvec).cast("array<float>").as("nv")) ++
        filterKeys.map(col)): _*)
      .withColumn("nn", sqrt(dot(col("nv"), col("nv"))))
    rankTopK(
      broadcast(q).join(c, filterKeys)
        .filter(col("qid") =!= col("nid"))
        .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn"))),
      "sim", k)
  }

  /** Pack the sign bits of `v` (dim ≤ 64) into ONE 64-bit word:
    * bit d set ⟺ v[d] ≥ 0. Distinct powers of two never carry, so the
    * bitwise-OR fold is a plain codegen'd expression chain. */
  def signWord(v: Column, dim: Int): Column = {
    require(dim >= 1 && dim <= 64, s"signWord packs into one long; dim=$dim")
    (0 until dim).map { d =>
      when(element_at(v, d + 1) >= 0, lit(1L << d)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Binary-quantized two-stage top-k: sign-sketch Hamming pre-rank, exact
    * cosine re-rank — the classic 32× compression play (Charikar's simhash
    * bound: E[hamming]/dim = θ(a,b)/π, so low Hamming tracks high cosine).
    *
    * Stage 1 scans a ONE-LONG-PER-ROW sketch projection of the corpus
    * (dim ≤ 64 floats → 8 bytes; at 100 TB of raw vectors the sketch table
    * is ~3 TB and is the only thing the pre-rank reads — in production it
    * is a stored column, computed at ingest) and ranks by
    * `bit_count(qw XOR nw)` — pure register codegen, no arrays touched.
    * The bounded-heap ranker keeps `preK` candidates per query; stage 2
    * ([[rerankCosine]]) scores ONLY those at full precision.
    *
    * Approximate by design (a true neighbor outside the Hamming-top-preK
    * is lost — recall vs brute force is asserted in SimilaritySpec), but
    * fully deterministic: pre-rank ties break on (hamming, nid), so the
    * DuckDB oracle replays both stages exactly. */
  def hammingRerankTopK(queries: DataFrame, qid: String, qvec: String,
                        corpus: DataFrame, nid: String, nvec: String,
                        k: Int, dim: Int = 64, preK: Int = 32): DataFrame = {
    graft.plans.FloatDotProduct.register(queries.sparkSession)
    val q = queries
      .select(col(qid).as("qid"), col(qvec).cast("array<float>").as("qv"))
      .select(col("qid"), signWord(col("qv"), dim).as("qw"))
    // sketch-only corpus projection: the float array is PRUNED from this
    // scan — stage 1 never reads a vector
    val c = corpus
      .select(col(nid).as("nid"), col(nvec).cast("array<float>").as("nv"))
      .select(col("nid"), signWord(col("nv"), dim).as("nw"))
    val scored = broadcast(q).join(c, col("qid") =!= col("nid"))
      // rankTopK ranks DESC; negate so smallest Hamming wins
      .withColumn("negh", -bit_count(col("qw").bitwiseXOR(col("nw"))))
    val cands = rankTopK(scored, "negh", preK).select("qid", "nid")
    rerankCosine(cands, queries, qid, qvec, corpus, nid, nvec, k)
  }

  /** Deterministic random hyperplanes: `planes(p)(d)` ~ U(-1,1), fixed seed. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextDouble() * 2 - 1))
  }

  /** Sign-pattern bucket id of a vector under the given hyperplanes. */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = dot(v.cast("array<float>"), typedLit(p.map(_.toFloat)))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k via multi-probe sign-pattern LSH: the corpus is
    * bucketed once by the sign pattern of `nPlanes` hyperplane projections;
    * each query probes its own bucket plus every bucket within Hamming
    * distance `probeRadius` of it (flipping the least-confident bits is the
    * classic refinement; flipping all is fine at small nPlanes). Candidates
    * are then ranked by exact cosine.
    *
    * Scale shape: corpus bucketing is one pass + one hash shuffle, reusable
    * across query batches; the probe join replicates only the (small) query
    * side `1 + nPlanes` times. */
  def lshCosineTopK(queries: DataFrame, qid: String, qvec: String,
                    corpus: DataFrame, nid: String, nvec: String,
                    k: Int, nPlanes: Int = 8, dim: Int = 64,
                    probeRadius: Int = 1): DataFrame = {
    require(probeRadius == 0 || probeRadius == 1,
      s"probeRadius=$probeRadius unsupported: only 0 (exact bucket) and 1 " +
        "(all single-bit flips) are implemented")
    graft.plans.FloatDotProduct.register(queries.sparkSession)
    val planes = hyperplanes(nPlanes, dim)
    val probes: Column => Column = b =>
      if (probeRadius == 0) array(b)
      else array((b +: (0 until nPlanes).map(i => b.bitwiseXOR(lit(1L << i)))): _*)
    val q = queries.select(col(qid).as("qid"), col(qvec).cast("array<float>").as("qv"))
      .withColumn("bucket", explode(probes(lshBucket(col("qv"), planes))))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val c = corpus.select(col(nid).as("nid"), col(nvec).cast("array<float>").as("nv"))
      .withColumn("bucket", lshBucket(col("nv"), planes))
      .withColumn("nn", sqrt(dot(col("nv"), col("nv"))))
    rankTopK(
      broadcast(q).join(c, Seq("bucket"))
        .filter(col("qid") =!= col("nid"))
        .dropDuplicates("qid", "nid") // a neighbor can match several probes
        .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn"))),
      "sim", k)
  }
}
