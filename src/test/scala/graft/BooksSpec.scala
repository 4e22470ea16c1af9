package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.detect.Detector
import graft.tables.SyntheticWeb

/** Second fixture family: books-style pages (ol.row of article.product_pod)
  * — reproduces the reference golden `section > div:last-child > ol.row`
  * (test_plain_list.py:18-24) and its field extraction.
  */
class BooksSpec extends AnyFunSuite {

  def detect(host: Int, k: Long, nOnHost: Long = 5) = {
    val html = SyntheticWeb.booksPageHtml(host, k, nOnHost)
    Detector.detectHtml(s"https://books-host$host.example/page-${k + 1}.html",
      html.getBytes("UTF-8"))
  }

  test("books page: top list selector matches the reference golden") {
    val out = detect(0, 0)
    assert(out.lists.nonEmpty)
    val top = out.lists.head
    assert(top.listSelector == SyntheticWeb.GoldenBooksListSelector,
      s"got ${top.listSelector}")
    assert(top.itemsSelector.startsWith("li.col-xs-6"))
    assert(top.data.size >= 12)
  }

  test("extracted titles byte-match the oracle") {
    for (host <- 0 until 2; k <- 0L until 2L) {
      val out = detect(host, k)
      val top = out.lists.head
      // the h3>a text field carries the title
      val titleField = top.fields.find(f =>
        f.fieldType == "text" && f.selector.endsWith("h3 > a")).orElse(
        top.fields.find(f => f.fieldType == "text" && f.selector.contains("h3")))
      assert(titleField.isDefined, s"fields: ${top.fields.map(_.selector)}")
      val titles = top.data.flatMap(_.values.get(titleField.get.name)).toVector
      assert(titles == SyntheticWeb.expectedBookTitles(host, k))
    }
  }

  test("image field extracted with resolved src") {
    val out = detect(1, 1)
    val top = out.lists.head
    val img = top.fields.find(_.fieldType == "image_url")
    assert(img.isDefined)
    val srcs = top.data.flatMap(_.values.get(img.get.name))
    assert(srcs.nonEmpty && srcs.forall(_.startsWith("https://books-host1.example/media/")))
  }

  test("pagination to the next catalogue page; absent on the last page") {
    val out = detect(0, 0, nOnHost = 3)
    assert(out.pagination.isDefined)
    assert(out.pagination.get.nextUrl ==
      "https://books-host0.example/catalogue/page-2.html")
    val last = detect(0, 2, nOnHost = 3)
    assert(last.pagination.isEmpty)
  }

  test("pagination-chain crawl re-extracts all pages with learned rules") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    // a 4-page quotes chain on one host (urls follow /page/k)
    val nPages = 4
    val pages = (0 until nPages).map { k =>
      (SyntheticWeb.pageUrl(0, k),
        SyntheticWeb.pageHtml(0, k, nPages, 4).getBytes("UTF-8"))
    }.toDF("url", "html")
    val rows = graft.frontier.PaginationCrawl
      .crawl(spark, pages, Seq(SyntheticWeb.pageUrl(0, 0)))
      .collect()
    assert(rows.map(_.page_url).distinct.length == nPages, "all chain pages visited")
    // learned rules re-applied: quote text per page matches the oracle text
    for (k <- 0 until nPages) {
      val pageRows = rows.filter(_.page_url == SyntheticWeb.pageUrl(0, k))
        .sortBy(_.item_idx)
      val texts = pageRows.flatMap(_.values.get("Field_text_1")).mkString("\n")
      assert(texts == SyntheticWeb.expectedText(0, k), s"page $k")
    }
    // hop numbering is the chain depth
    assert(rows.filter(_.hop == 3).nonEmpty)
  }
}
