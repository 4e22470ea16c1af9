package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

import graft.tables.{ExpectedDetect, SyntheticWeb}

/** Pins the engine's distributed detect/crawl queries to the CLOSED-FORM
  * expected tables (ExpectedDetect) — the same tables the driver's DuckDB
  * oracle reads at verify time. If the generator template, the detector, or
  * the expected functions drift apart, this fails before the driver does.
  */
class ExpectedDetectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private def assertSame(name: String,
      actual: org.apache.spark.sql.DataFrame,
      expected: org.apache.spark.sql.DataFrame): Unit = {
    assert(actual.columns.toSeq == expected.columns.toSeq, s"$name columns")
    val a = rows(actual)
    val e = rows(expected)
    val onlyA = a.diff(e).take(3)
    val onlyE = e.diff(a).take(3)
    assert(a == e,
      s"$name mismatch: actual=${a.size} expected=${e.size}\n only-actual: ${onlyA.mkString(" ;; ")}\n only-expected: ${onlyE.mkString(" ;; ")}")
  }

  private def q(name: String) = Queries.all(name)(spark, "/unused")

  test("c1_detect_lists matches the closed-form fixture table") {
    assertSame("c1", q("c1_detect_lists"), ExpectedDetect.c1(spark, 48, 4))
  }

  test("c2_extract_rows matches the closed-form fixture table") {
    assertSame("c2", q("c2_extract_rows"), ExpectedDetect.c2(spark, 24, 4))
  }

  test("c3_text_parity matches the closed-form fixture table") {
    assertSame("c3", q("c3_text_parity"), ExpectedDetect.c3(spark, 32, 4))
  }

  test("c4_pagination matches the closed-form fixture table") {
    assertSame("c4", q("c4_pagination"), ExpectedDetect.c4(spark, 24, 4))
  }

  test("c5_crawl_rounds matches the independent crawl simulator") {
    assertSame("c5", q("c5_crawl_rounds"),
      ExpectedDetect.c5(spark, 64, 4, hostBudget = 4, roundSize = 32, maxRounds = 3))
  }

  test("c6_highlight matches the closed-form marker counts") {
    assertSame("c6", q("c6_highlight"), ExpectedDetect.c6(spark, 16, 4))
  }

  test("c7_links matches the closed-form link-list table") {
    assertSame("c7", q("c7_links"), ExpectedDetect.c7(spark, 16, 4))
  }

  test("c8_books_extract matches the closed-form fixture table") {
    assertSame("c8", q("c8_books_extract"), ExpectedDetect.c8(spark, 4, 4))
  }

  test("closed-form links match the engine's extracted links per page") {
    for ((h, k, n) <- ExpectedDetect.fastPages(16, 4)) {
      val html = SyntheticWeb.pageHtml(h, k, n, 4).getBytes("UTF-8")
      val doc = graft.dom.HtmlParser.parseBytes(html)
      val actual = graft.detect.Detector.extractLinks(SyntheticWeb.pageUrl(h, k), doc)
      assert(actual == ExpectedDetect.links(h, k, n, 4), s"links host=$h k=$k")
    }
  }
}
