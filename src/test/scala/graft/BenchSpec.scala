package graft

import org.scalatest.funsuite.AnyFunSuite

/** The graded scaling artifact comes from the forked bench protocol
  * ([[Bench]] → pinned child JVM → [[BenchWorker]] → [[BenchLevel]]); these
  * specs keep that path from rotting without paying a real measurement's
  * cost: a tiny in-process level, and one real child-JVM protocol
  * round-trip.
  */
class BenchSpec extends AnyFunSuite {

  test("BenchLevel measures a tiny level in-process") {
    val lvl = new BenchLevel(cpus = 4, nPages = 2000, nHosts = 4)
    lvl.setup(skipWarm = true)
    val (thr, rows) = lvl.runSingle()
    assert(thr > 0.0)
    assert(rows > 0L)
    assert(lvl.runMulti(3) > 0.0)
    // no close(): the SparkContext is shared across suites in this JVM
  }

  test("BenchWorker protocol round-trips in a child JVM") {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(javaBin) ++ Bench.jdk17AddOpens ++ Seq(
      "-Xmx4g", "-XX:ActiveProcessorCount=2",
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.BenchWorker", "2", "2000", "4")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val proc = pb.start()
    try {
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      val stdin = new java.io.PrintWriter(proc.getOutputStream, true)
      def nextProtocol(deadlineSec: Int): String = {
        val deadline = System.nanoTime() + deadlineSec * 1e9.toLong
        var l = out.readLine()
        while (l != null && !l.startsWith("GRAFTW ")) {
          assert(System.nanoTime() < deadline, "worker protocol timeout")
          l = out.readLine()
        }
        assert(l != null, "worker exited before responding")
        l.drop(7)
      }
      assert(nextProtocol(600) == "READY")
      stdin.println("single")
      val single = nextProtocol(600).split("\\s+")
      assert(single(0) == "SINGLE", s"got: ${single.mkString(" ")}")
      assert(single(1).toDouble > 0.0)
      assert(single(2).toLong > 0L)
      stdin.println("bogus")
      assert(nextProtocol(60).startsWith("ERR"))
      stdin.println("exit")
      assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally if (proc.isAlive) proc.destroyForcibly()
  }
}
