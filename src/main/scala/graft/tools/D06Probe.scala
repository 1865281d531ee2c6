package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: incremental-dedup cost, managed (per-call corpus recompute) vs
  * SignatureIndex probe — isolates whether the d06 bench line pays probe
  * cost only or is quietly recomputing corpus-side work. */
object D06Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val d = graft.io.Tables.load(spark, sf, "documents")
    val batch = d.filter(col("doc_id") % 2 === 1)
    val corpus = d.filter(col("doc_id") % 2 === 0)

    // old shape: everything per call
    val (nOld, tOld) = t(graft.operators.Dedup.incrementalExactPairs(
      batch, corpus, "doc_id", "text", threshold = 0.8).count())
    println(f"### managed(per-call): $nOld pairs in $tOld%.2fs")

    // build once, probe twice (second probe = steady state)
    val (idx, tBuild) = t(graft.operators.Dedup.signatureBuild(corpus, "doc_id", "text"))
    println(f"### index build: $tBuild%.2fs")
    val (n1, tP1) = t(graft.operators.Dedup.incrementalExactPairsIndexed(
      batch, idx, "doc_id", "text", threshold = 0.8).count())
    val (n2, tP2) = t(graft.operators.Dedup.incrementalExactPairsIndexed(
      batch, idx, "doc_id", "text", threshold = 0.8).count())
    println(f"### indexed probe: $n1 pairs in $tP1%.2fs; again: $n2 in $tP2%.2fs")
    idx.release()

    // d11 shape: 2-deletion neighborhood linkage over customer names
    val cust = graft.io.Tables.load(spark, sf, "customer")
    val (nE, tE) = t(graft.operators.Dedup.editPairsK(
      cust, "c_custkey", "c_nationkey", "c_name", k = 2).count())
    println(f"### editPairsK(2): $nE pairs in $tE%.2fs")
    spark.stop()
  }
}
