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
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    broadcast(q).join(c, col("qid") =!= col("nid"))
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  /** IVF (inverted-file) approximate top-k: the corpus is coarsely
    * quantized to `nCells` k-means centroids; each query probes only the
    * `nProbe` nearest cells and ranks those candidates by exact cosine.
    *
    * The scale path for query-heavy workloads: centroid training runs on a
    * bounded sample, cell assignment is one broadcast-map pass over the
    * corpus (the assignment and its hash shuffle are reusable across query
    * batches — persist the returned assignment in a real index), and each
    * query touches ~nProbe/nCells of the corpus. Centroids are deterministic
    * (fixed seed, fixed sample). Complements [[lshCosineTopK]]: IVF adapts
    * to the data distribution where hyperplane LSH is data-oblivious.
    */
  def ivfTopK(queries: DataFrame, qid: String, qvec: String,
              corpus: DataFrame, nid: String, nvec: String,
              k: Int, nCells: Int = 16, nProbe: Int = 4,
              trainSample: Int = 10000, seed: Long = 7L): DataFrame = {
    val spark = corpus.sparkSession
    graft.plans.FloatDotProduct.register(spark)
    import spark.implicits._

    // --- train centroids on a bounded sample (driver-side Lloyd's: the
    // sample is capped, so this is O(trainSample × nCells × iters) locally
    // — no MLlib dependency surface needed for a coarse quantizer)
    val sample = corpus.select(col(nvec)).limit(trainSample)
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "corpus is empty")
    val dim = sample.head.length
    val rng = new scala.util.Random(seed)
    var centroids = Array.fill(nCells)(sample(rng.nextInt(sample.length)).clone())
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < dim) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    (1 to 10).foreach { _ =>
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Long](nCells)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var i = 0; while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    val centroidLit = typedLit(centroids.map(_.map(_.toFloat).toSeq).toSeq)

    // --- cell assignment: argmin distance over the broadcast centroid list,
    // computed with the codegen'd dot kernel (|v-c|^2 = |v|^2 - 2v·c + |c|^2;
    // |v|^2 constant per row → argmax of (v·c - |c|^2/2))
    def cellOf(v: Column): Column = {
      val scores = centroids.indices.map { c =>
        val cNorm2 = centroids(c).map(x => x * x).sum
        struct((dot(v, centroidLit.getItem(c)) - lit(cNorm2 / 2)).as("s"),
               lit(c).as("c"))
      }
      greatest(scores: _*).getField("c")
    }
    // nProbe nearest cells for a query: rank the same scores, take top n
    def probeCells(v: Column): Column = {
      val scores = array(centroids.indices.map { c =>
        val cNorm2 = centroids(c).map(x => x * x).sum
        struct((dot(v, centroidLit.getItem(c)) - lit(cNorm2 / 2)).as("s"),
               lit(c).as("c"))
      }: _*)
      slice(reverse(array_sort(scores)), 1, nProbe)
    }

    val c = corpus.select(col(nid).as("nid"), col(nvec).cast("array<float>").as("nv"))
      .withColumn("cell", cellOf(col("nv")))
      .withColumn("nn", sqrt(dot(col("nv"), col("nv"))))
    val q = queries.select(col(qid).as("qid"), col(qvec).cast("array<float>").as("qv"))
      .withColumn("cell", explode(probeCells(col("qv")).getField("c")))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    broadcast(q).join(c, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid")
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
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
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    broadcast(q).join(c, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid") // a neighbor can match several probes
      .withColumn("sim", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }
}
