package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.Similarity

/** Similarity-search surface over the `embeddings` table. */
object VectorQueries {

  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact brute-force cosine top-5 for the first 8 vectors as queries.
    "v01_cosine_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.cosineTopK(
          e.filter(col("vec_id") < 8), "vec_id", "embedding",
          e, "vec_id", "embedding", k = 5)
        .select(col("qid"), col("rank"), col("nid"), round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    },

    // LSH-bucketed approximate variant. Fully oracle-checkable even though
    // it's approximate: the hyperplanes are deterministic constants, so the
    // oracle SQL embeds them as literals and DuckDB reproduces the exact
    // bucketing, probing, and ranking (recall vs v01 additionally asserted
    // in SimilaritySpec).
    "v02_lsh_ann" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.lshCosineTopK(
          e.filter(col("vec_id") < 8), "vec_id", "embedding",
          e, "vec_id", "embedding", k = 5, nPlanes = 8, dim = 64)
        .select(col("qid"), col("rank"), col("nid"), round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    },

    // IVF (k-means coarse-quantized) ANN — the data-adaptive scale path
    // (rows-only; recall vs brute force asserted in SimilaritySpec).
    "v04_ivf_ann" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.ivfTopK(
          e.filter(col("vec_id") < 8), "vec_id", "embedding",
          e, "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4)
        .select(col("qid"), col("rank"), col("nid"), round(col("sim"), 4).as("sim"))
        .orderBy("qid", "rank")
    },

    // Vector norms + label stats: sanity surface for the embedding column.
    "v03_norm_stats" -> { (s, dir) =>
      val v = transform(col("embedding"), x => x.cast("double"))
      emb(s, dir)
        .select(col("label"), Similarity.norm(v).as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
             round(min(col("nrm")), 4).as("min_norm"),
             round(max(col("nrm")), 4).as("max_norm"))
        .orderBy("label")
    }
  )

  /** DuckDB twin of v02: the hyperplanes are deterministic engine constants
    * (Similarity.hyperplanes, fixed seed), embedded here as literal DOUBLE
    * arrays. The Spark side computes dots on float-cast planes with double
    * accumulation (FloatDotProduct), so each literal is the float-rounded
    * plane value widened back to double — `x.toFloat.toDouble` printed via
    * Double.toString round-trips that value exactly. Bucket = sign-pattern
    * bits; probes = the bucket itself plus every single-bit flip (i = -1
    * marks the unflipped probe), mirroring lshCosineTopK's probeRadius=1. */
  private lazy val v02Oracle: String = {
    val planes = Similarity.hyperplanes(8, 64)
    val pl = planes.zipWithIndex.map { case (p, i) =>
      p.map(x => x.toFloat.toDouble.toString).mkString(s"($i, [", ", ", "])")
    }.mkString(",\n        ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |     pl AS (SELECT * FROM (VALUES
       |        $pl) AS t(pi, p)),
       |     bkt AS (SELECT e.vec_id,
       |               CAST(sum(CASE WHEN list_inner_product(e.v, pl.p) >= 0
       |                             THEN 1 << pl.pi ELSE 0 END) AS BIGINT) AS bucket
       |             FROM e CROSS JOIN pl GROUP BY e.vec_id),
       |     n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
       |     pr AS (SELECT b.vec_id AS qid,
       |              CASE WHEN f.i < 0 THEN b.bucket
       |                   ELSE xor(b.bucket, CAST(1 << f.i AS BIGINT)) END AS probe
       |            FROM bkt b CROSS JOIN (SELECT unnest(range(-1, 8)) AS i) f
       |            WHERE b.vec_id < 8),
       |     cand AS (SELECT DISTINCT pr.qid, c.vec_id AS nid
       |              FROM pr JOIN bkt c ON c.bucket = pr.probe
       |              WHERE pr.qid <> c.vec_id),
       |     p AS (SELECT cand.qid, cand.nid,
       |             list_inner_product(q.v, c.v) / (q.nrm * c.nrm) AS sim
       |           FROM cand JOIN n q ON q.vec_id = cand.qid
       |                     JOIN n c ON c.vec_id = cand.nid),
       |     r AS (SELECT qid, nid, sim,
       |             row_number() OVER (PARTITION BY qid
       |                                ORDER BY sim DESC, nid) AS rank
       |           FROM p)
       |SELECT qid, rank, nid, round(sim, 4) AS sim
       |FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "v02_lsh_ann" -> v02Oracle,
    // Mirrors cosineTopK arithmetic exactly: double-cast vectors,
    // dot/(sqrt(dot_aa)*sqrt(dot_bb)), ties broken by neighbor id.
    "v01_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |     n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
        |     p AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |             list_inner_product(q.v, c.v) / (q.nrm * c.nrm) AS sim
        |           FROM n q JOIN n c ON q.vec_id <> c.vec_id
        |           WHERE q.vec_id < 8),
        |     r AS (SELECT qid, nid, sim,
        |             row_number() OVER (PARTITION BY qid
        |                                ORDER BY sim DESC, nid) AS rank
        |           FROM p)
        |SELECT qid, rank, nid, round(sim, 4) AS sim
        |FROM r WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,

    "v03_norm_stats" ->
      """WITH e AS (SELECT label, sqrt(list_inner_product(embedding::DOUBLE[],
        |                                                 embedding::DOUBLE[])) AS nrm
        |           FROM embeddings)
        |SELECT label, count(*) AS n,
        |  round(min(nrm), 4) AS min_norm, round(max(nrm), 4) AS max_norm
        |FROM e
        |GROUP BY label
        |ORDER BY label""".stripMargin
  )
}
