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
    val (s, m, json) = graft.Calib.measured("")
    if (s < 0 || m < 0) println("") // unreachable; keeps s/m observable
    println(s"{$json}")
  }
}
