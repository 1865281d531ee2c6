package graft.tools

import org.apache.spark.sql.functions._

/** Postings fold economics at bench scale: time a full corpus rebuild vs
  * folding a 1% delta (pmod 100) into the 99% standing index. What the
  * fold skips is the standing corpus' TOKENIZATION + both corpus-wide
  * aggregates — the O(total text bytes) terms at 100 TB; at toy scale
  * both paths sit near the task-count floor, so read the RATIO direction,
  * not the absolute gap (the FoldProbe discipline).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.LexFoldProbe */
object LexFoldProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // standing build is the once-per-corpus-version cost — not timed here
    val standing = graft.operators.Postings.build(
      docs.filter(pmod(col("doc_id"), lit(100)) =!= 0))
    var folded: graft.operators.Postings.Index = null
    val foldSec = timed {
      folded = graft.operators.Postings.foldDocs(standing,
        docs.filter(pmod(col("doc_id"), lit(100)) === 0))
    }
    standing.release()
    val foldedDocs = folded.nDocs
    folded.release()
    var rebuilt: graft.operators.Postings.Index = null
    val rebuildSec = timed { rebuilt = graft.operators.Postings.build(docs) }
    val rebuiltDocs = rebuilt.nDocs
    rebuilt.release()
    require(foldedDocs == rebuiltDocs,
      s"fold=$foldedDocs docs, rebuild=$rebuiltDocs")
    println(f"""{"metric":"lex_fold_vs_rebuild","docs":$rebuiltDocs,""" +
      f""""fold_sec":$foldSec%.2f,"rebuild_sec":$rebuildSec%.2f}""")
    spark.stop()
  }
}
