package graft.tools

import graft.tables.SyntheticWeb
import graft.detect.{Detector, PageGraph, PlainList, Numeric => Num}
import graft.dom.HtmlParser

/** Dev tool: single-threaded per-stage timing of the fused detect map. */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200
    val htmls = (0 until n).map { i =>
      (SyntheticWeb.pageUrl(i % 4, i / 4),
        SyntheticWeb.pageHtml(i % 4, i / 4, 50, 4).getBytes("UTF-8"))
    }
    // warm up
    htmls.take(20).foreach { case (u, h) => Detector.detectHtml(u, h) }

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-16s ${(System.nanoTime() - t0) / 1e6 / n}%8.2f ms/page")
      r
    }

    time("parse") { htmls.foreach { case (_, h) => HtmlParser.parseBytes(h) } }
    val docs = htmls.map { case (u, h) => (u, HtmlParser.parseBytes(h)) }
    val graphs = time("graph") { docs.map { case (u, d) => (u, d, PageGraph(d).get) } }
    val mats = time("features") { graphs.map { case (u, d, g) => (u, d, g, PlainList.buildFeatureMatrix(g)) } }
    val labs = time("dbscan") { mats.map { case (u, d, g, x) =>
      (u, d, g, Num.dbscan(x, PlainList.DbscanEps, PlainList.DbscanMinSamples)) } }
    time("rest") { labs.foreach { case (u, d, g, l) =>
      val cands = PlainList.preFilter(g, l)
      val scored = PlainList.scoreCandidates(g, cands)
      () } }
    time("full detect") { htmls.foreach { case (u, h) => Detector.detectHtml(u, h) } }
    time("extract+full") { htmls.foreach { case (u, h) =>
      val doc = HtmlParser.parseBytes(h)
      Detector.detectDoc(u, doc)
      Detector.extractLinks(u, doc) } }
  }
}

/** Dev tool: raw thread-scaling of detectHtml, no Spark. */
object ThreadScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    val htmls = (0 until n).map { i =>
      (graft.tables.SyntheticWeb.pageUrl(i % 16, i / 16),
        graft.tables.SyntheticWeb.pageHtml(i % 16, i / 16, 400, 16).getBytes("UTF-8"))
    }.toArray
    htmls.take(50).foreach { case (u, h) => graft.detect.Detector.detectHtml(u, h) }
    for (threads <- Seq(1, 8, 32)) {
      val pool = new java.util.concurrent.ForkJoinPool(threads)
      val t0 = System.nanoTime()
      pool.submit(new Runnable {
        def run(): Unit =
          java.util.Arrays.stream(htmls).parallel().forEach { case (u, h) =>
            graft.detect.Detector.detectHtml(u, h); ()
          }
      }).get()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads%2d  ${n / sec}%8.1f pages/s  (${sec}%5.2f s)")
      pool.shutdown()
    }
  }
}

/** Dev tool: detect-through-Spark scaling (cache read + serde + map). */
object SparkScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    for (cpus <- Seq(8, 32)) {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val pages = graft.tables.SyntheticWeb.pagesFast(spark, n.toLong, 16, cpus * 2).cache()
      pages.count()
      // warm
      graft.detect.Detector.detect(pages.limit(3000).as[graft.detect.Page]).count()
      for (t <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.detect.Detector.detect(pages).agg(org.apache.spark.sql.functions.sum($"nNodes")).head()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"cpus=$cpus trial=$t  ${n / sec}%8.1f pages/s (${sec}%5.2f s)")
      }
      spark.stop()
    }
  }
}

/** Dev tool: kernel thread-scaling vs page weight. */
object WeightScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000
    val weight = if (args.length > 1) args(1).toInt else 4
    val htmls = (0 until n).map { i =>
      (graft.tables.SyntheticWeb.pageUrl(i % 16, i / 16),
        graft.tables.SyntheticWeb.pageHtml(i % 16, i / 16, 400, 16, weight).getBytes("UTF-8"))
    }.toArray
    println(s"avg page bytes: ${htmls.map(_._2.length.toLong).sum / n}")
    htmls.take(30).foreach { case (u, h) => graft.detect.Detector.detectHtml(u, h) }
    for (threads <- Seq(8, 32); t <- 1 to 2) {
      val pool = new java.util.concurrent.ForkJoinPool(threads)
      val t0 = System.nanoTime()
      pool.submit(new Runnable {
        def run(): Unit =
          java.util.Arrays.stream(htmls).parallel().forEach { case (u, h) =>
            graft.detect.Detector.detectHtml(u, h); ()
          }
      }).get()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads%2d trial=$t  ${n / sec}%8.1f pages/s  (${sec}%5.2f s)")
      pool.shutdown()
    }
  }
}
