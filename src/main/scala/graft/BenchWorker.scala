package graft

/** Child-JVM side of the forked bench protocol (see [[Bench]]): measures ONE
  * parallelism level in a JVM that the orchestrator pins to exactly `cpus`
  * physical cores (`taskset -c`) with `-XX:ActiveProcessorCount=cpus`, so the
  * level is a faithful model of an N-core executor node — GC pauses, JIT
  * compilation and shuffle IO threads all compete for the same N cores, the
  * way they would on real cluster hardware. (In-process measurement instead
  * hands the 4-core level a 32-core machine's worth of GC/JIT silicon, which
  * inflates its throughput and depresses the measured scaling efficiency.)
  *
  * Protocol, line-oriented: commands on stdin (`single` | `multi <rounds>` |
  * `exit`), results on stdout prefixed `GRAFTW ` so the orchestrator can
  * filter them out of Spark's console noise:
  *   GRAFTW READY                     — setup (cache+warm+bootstrap) done
  *   GRAFTW SINGLE <urls/sec> <rows>  — one maximal-round trial
  *   GRAFTW MULTI <urls/sec>          — one multi-round trial
  *   GRAFTW ERR <msg>                 — command failed (worker stays alive)
  */
object BenchWorker {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nPages = args(1).toInt
    val nHosts = args(2).toInt
    val out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(System.out, "UTF-8"), true)
    val level = new BenchLevel(cpus, nPages, nHosts)
    try {
      level.setup()
      out.println("GRAFTW READY")
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
      var line = in.readLine()
      while (line != null && line.trim != "exit") {
        val words = line.trim.split("\\s+")
        try words(0) match {
          case "single" =>
            val (thr, rows) = level.runSingle()
            out.println(f"GRAFTW SINGLE $thr%.1f $rows%d")
          case "multi" =>
            val rounds = if (words.length > 1) words(1).toInt else 8
            out.println(f"GRAFTW MULTI ${level.runMulti(rounds)}%.1f")
          case "" => ()
          case other => out.println(s"GRAFTW ERR unknown command: $other")
        } catch {
          case e: Throwable =>
            out.println(s"GRAFTW ERR ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").replace('\n', ' ').take(200))
        }
        line = in.readLine()
      }
    } catch {
      case e: Throwable =>
        out.println(s"GRAFTW ERR setup ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").replace('\n', ' ').take(200))
    } finally level.close()
  }
}
