package graft

/** Fixed-work CPU probes for bench stamps. The guest-visible host
  * stamps (loadavg, PSI) miss HYPERVISOR-level throttling — measured
  * this round: scale-run wall times inflated 10–25× while /proc/stat
  * read 99% idle, PSI memory/io ~0 and steal 0 — so every timing
  * artifact also stamps the wall seconds of a fixed spin workload.
  * The numbers are only meaningful RELATIVE to the same host's other
  * stamps: a calib_* far above its sibling artifacts' values marks
  * the run's walls as untrustworthy regardless of loadavg.
  *
  * `single` = one thread folding 1<<28 xorshift64 steps (~0.2–0.4 s
  * nominal). `multi` = 16 threads each doing the same work (~equal to
  * `single` on an unthrottled ≥16-core host; a multi/single ratio ≫ 1
  * is the signature of a core-quota throttle that a single-thread
  * probe cannot see).
  */
object Calib {
  private def spin(): Long = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    val n = 1 << 28
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    x
  }

  /** Wall seconds for one thread of fixed work. */
  def single(): Double = {
    val t0 = System.nanoTime()
    val x = spin()
    val dt = (System.nanoTime() - t0) / 1e9
    if (x == 42L) println("") // keep the fold observable
    dt
  }

  /** Wall seconds for 16 concurrent threads of the same fixed work
    * (slowest thread's completion — i.e. the barrier wall). */
  def multi(threads: Int = 16): Double = {
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      new Thread(() => { if (spin() == 42L) println("") })
    }
    ts.foreach(_.start())
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** `"calib_single<sfx>":x,"calib_multi<threads><sfx>":y` — splice
    * into a JSON stamp (sfx = "_start" / "_end"). The multi key is
    * derived from the thread count so a non-default probe can never
    * mislabel its stamp. */
  def stampJson(sfx: String, threads: Int = 16): String =
    measured(sfx, threads)._3

  /** [[stampJson]] plus the raw (single, multi) seconds, for callers
    * that COMPUTE on the stamps (Bench's window_dirty flag) instead of
    * only printing them.
    *
    * Each stamp is the MIN of several probe runs, not one draw: r18
    * measured single-draw walls of the fixed workload fluctuating
    * 0.45–0.96 s inside one JVM on this box (scheduler noise + the
    * box's recurring exogenous bursts), so a one-draw start-vs-end
    * drift check fired on its own sampling noise — including on a
    * capture whose END was FASTER than its start (0.506 → 0.393,
    * post-pre-touch warmup). The min is the host's CAPABILITY at stamp
    * time: instant noise can only inflate a draw, never deflate it, so
    * min-of-N converges on capability while a SUSTAINED hypervisor
    * throttle — the contamination the stamp exists to catch — still
    * inflates every draw including the min. */
  def measured(sfx: String, threads: Int = 16): (Double, Double, String) = {
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    // JIT warmup so the _start stamp doesn't bill interpreter time
    // that the _end stamp won't pay
    single(); single()
    val s = (1 to 4).map(_ => single()).min
    val m = (1 to 3).map(_ => multi(threads)).min
    (s, m, s""""calib_single$sfx":${fmt(s)},""" +
      s""""calib_multi$threads$sfx":${fmt(m)}""")
  }
}
