package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object FloodProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", 8)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def cluster(n: Int, docLen: Int, subs: Int) = {
      val base = {
        val rng = new scala.util.Random(7)
        Array.fill(docLen)("base" + rng.nextInt(100000))
      }
      spark.range(n).map { i =>
        val rng = new scala.util.Random(i)
        val words = base.clone()
        (0 until subs).foreach(_ => words(rng.nextInt(docLen)) = s"u${i}x${rng.nextInt(1000)}")
        (i, words.mkString(" "), "s")
      }.toDF("doc_id", "text", "source")
    }

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    def run(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val mp = graft.operators.Dedup.minhashLshPairsManaged(df, "doc_id", "text",
        bands = 32, threshold = 0.6)
      val (nA, tA) = t(mp.pairs.count())         // sig + cand + est
      val (_, tB) = t(mp.pairs.count())          // cand + est (sigs cached)
      val me = graft.operators.Dedup.minhashExactPairsManaged(df, "doc_id", "text", threshold = 0.8)
      val (nC, tC) = t(me.pairs.count())         // cand + est + exact (sigs cached)
      println(f"### $label: estPairs=$nA exactPairs=$nC | sig+cand+est=$tA%.1fs candEst=$tB%.1fs candEstExact=$tC%.1fs => sig~${tA - tB}%.1fs exact~${tC - tB}%.1fs")
      me.release(); mp.release()
    }

    val real = graft.io.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"), col("source"))
    run("friendly(n=5000)", real)
    run("cluster(n=5000, j~0.5)", cluster(5000, 100, 10))
    spark.stop()
  }
}
