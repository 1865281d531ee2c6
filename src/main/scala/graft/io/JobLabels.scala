package graft.io

import org.apache.spark.SparkContext

/** Job-description labels for multi-phase operators (guide §1.5): the
  * tiered folds and maintenance majors run dozens of jobs per call, and
  * an unlabeled job is unattributable in the UI / listener traces. The
  * label is thread-local (Spark's own semantics) and the previous value
  * is restored on exit, so nesting and the streaming wrappers' own
  * descriptions survive. */
object JobLabels {

  def labeled[T](sc: SparkContext, label: String)(body: => T): T = {
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(label)
    try body finally sc.setJobDescription(prev)
  }
}
