package graft.tools

/** One-shot fixed-work CPU stamp for the idle-gate in
  * `tools/capture_clean.sh` (r17 verdict #1): prints a single JSON
  * line with [[graft.Calib]]'s single/multi16 wall seconds so the
  * capture wrapper can require a STABLE calib (two probes within
  * tolerance) before launching a timing main — loadavg alone misses
  * hypervisor throttling, the contamination mode that dirtied r16/r17
  * captures mid-run. No Spark session; ~3 s wall. */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    // optional diagnostic mode: `CalibProbe seq N` prints N raw
    // single() walls then 4 multi() walls from ONE JVM — used to
    // measure how long the post-pre-touch warmup curve lasts (the
    // r18 finding that a fresh 16 GB pre-touched heap depresses the
    // first probes 20-30%)
    if (args.length >= 1 && args(0) == "seq") {
      val n = if (args.length >= 2) args(1).toInt else 12
      (1 to n).foreach { i =>
        val s = graft.Calib.single()
        println(f"single[$i%2d] = $s%.3f")
      }
      (1 to 4).foreach { i =>
        val m = graft.Calib.multi()
        println(f"multi[$i%2d] = $m%.3f")
      }
      return
    }
    val (s, m, json) = graft.Calib.measured("")
    if (s < 0 || m < 0) println("") // unreachable; keeps s/m observable
    println(s"{$json}")
  }
}
