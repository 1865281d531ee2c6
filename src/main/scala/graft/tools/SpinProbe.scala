package graft.tools

/** One-shot box-health probe: prints the all-core and single-core spin
  * scores (HostCpu calibration units — r9-healthy readings are ~3000
  * all-core / ~110 single-core on this guest class) plus loadavg, so a
  * slow timing can indict the box in seconds without running a bench.
  * Usage: runMain graft.tools.SpinProbe */
object SpinProbe {
  def main(args: Array[String]): Unit = {
    val all = HostCpu.spinScore()
    val one = HostCpu.spinScore(200, 1)
    val load = try {
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    } catch { case _: Exception => "n/a" }
    println(s"""{"spin_all_cores":$all,"spin_one_core":$one,"loadavg":"$load"}""")
  }
}
