package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.detect.{DetectOutput, Detector, ListResultOut}
import graft.dom.HtmlParser
import graft.tables.SnapshotStore
import graft.urls.UrlOps

/** The reference's request CRUD surface
  * (/root/reference/webspot/web/routes/api/request.py) re-expressed as
  * library calls over the snapshot table layer: submit detection requests
  * (batch, not per-HTTP-call), list newest-first with skip/limit (W4), fetch
  * by id, and the `/api/links` endpoint's best-link-list extraction (A-8).
  * MongoDB is replaced by a snapshot-versioned parquet table.
  */
final case class RequestDoc(
    id: String,
    url: String,
    status: String,
    n_lists: Int,
    results_json: String,
    created_at: java.sql.Timestamp)

final case class LinkOut(url: String, text: String)
final case class LinkListOut(name: String, confidence: Double, links: Seq[LinkOut])

object RequestStore {

  val StatusSuccess = "success"
  val StatusError = "error"

  def requestId(url: String, ts: Long): String =
    java.lang.Long.toHexString(UrlOps.fnv1a64(s"$url@$ts"))

  /** Submit a batch of (url, html) pages: run the fused detect map, append a
    * snapshot of RequestDocs (the async/sync distinction of the reference is
    * subsumed by Spark's job scheduling — §3.1).
    */
  def submit(spark: SparkSession, storeDir: String,
      pages: Dataset[(String, Array[Byte])],
      now: java.sql.Timestamp): Dataset[RequestDoc] = {
    import spark.implicits._
    val ts = now.getTime
    val docs = pages.map { case (url, html) =>
      try {
        val out = Detector.detectHtml(url, html)
        RequestDoc(requestId(url, ts), url, StatusSuccess, out.lists.size,
          resultsJson(out), now)
      } catch {
        case e: Exception =>
          RequestDoc(requestId(url, ts), url, StatusError, 0,
            s"""{"error":${jsonStr(e.toString)}}""", now)
      }
    }
    val prev = SnapshotStore.latestManifest(storeDir)
    val version = prev.map(_.version + 1).getOrElse(0)
    val prevDirs = prev.map(m => SnapshotStore.dirsOf(m, "requests")).getOrElse(Seq.empty)
    SnapshotStore.commit(storeDir, version, Map.empty,
      Map("version" -> version.toLong),
      deltas = Map("requests" -> (docs.toDF(), prevDirs)))
    docs
  }

  /** newest-first paging (request.py:24-28, W4). */
  def list(spark: SparkSession, storeDir: String, skip: Int, limit: Int): DataFrame =
    SnapshotStore.latestManifest(storeDir) match {
      case None => spark.emptyDataFrame
      case Some(m) =>
        SnapshotStore.read(spark, m, "requests")
          .orderBy(desc("created_at"), desc("id"))
          .offset(skip)
          .limit(limit)
    }

  def get(spark: SparkSession, storeDir: String, id: String): Option[RequestDoc] = {
    import spark.implicits._
    SnapshotStore.latestManifest(storeDir).flatMap { m =>
      SnapshotStore.read(spark, m, "requests")
        .filter(col("id") === id).as[RequestDoc].collect().headOption
    }
  }

  /** `/api/links` semantics (webspot/web/routes/api/link.py:54-109): per
    * list result, among its link_url fields pick the ONE with max total link
    * text; emit (url, text) per item, href transformed against the page url.
    */
  def linkLists(url: String, html: Array[Byte]): Seq[LinkListOut] = {
    val doc = HtmlParser.parseBytes(html)
    val out = Detector.detectDoc(url, doc)
    out.lists.flatMap { lr =>
      val linkFields = lr.fields.filter(_.fieldType == "link_url")
      val candidates = linkFields.map { f =>
        val items = graft.css.CssSelector.selectAll(doc, lr.fullItemsSelector)
        val links = items.flatMap { itemId =>
          graft.css.CssSelector.selectOne(doc, f.selector, scopeId = itemId).flatMap { fid =>
            doc(fid).attr("href").map { href =>
              // get_text(strip=True): stripped segments concatenated
              val text = strippedText(doc, fid)
              LinkOut(UrlOps.transformUrl(url, href), text)
            }
          }
        }
        (links, links.map(_.text.length).sum)
      }
      if (candidates.isEmpty) None
      else {
        val best = candidates.maxBy(_._2)._1 // first max wins (list.index(max))
        if (best.isEmpty) None
        else Some(LinkListOut(lr.name, lr.score, best))
      }
    }
  }

  /** BeautifulSoup get_text(strip=True) analog: each text segment stripped,
    * empties dropped, concatenated.
    */
  private def strippedText(doc: graft.dom.DomDocument, id: Int): String = {
    val sb = new StringBuilder
    def rec(i: Int): Unit = doc(i).content.foreach {
      case graft.dom.TextSeg(t) =>
        val s = t.strip(); if (s.nonEmpty) sb.append(s)
      case graft.dom.ChildRef(c) => rec(c)
    }
    rec(id)
    sb.result()
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Compact results JSON mirroring the reference's Result model shape. */
  def resultsJson(out: DetectOutput): String = {
    def listJson(l: ListResultOut): String = {
      val fields = l.fields.map(f =>
        s"""{"name":${jsonStr(f.name)},"selector":${jsonStr(f.selector)},"type":${jsonStr(f.fieldType)},"attribute":${jsonStr(f.attribute)}}""")
        .mkString("[", ",", "]")
      val data = l.data.map(r =>
        r.values.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }
          .mkString("{", ",", "}")).mkString("[", ",", "]")
      s"""{"name":${jsonStr(l.name)},"score":${l.score},"selectors":{"list":${jsonStr(l.listSelector)},"items":${jsonStr(l.itemsSelector)},"full_items":${jsonStr(l.fullItemsSelector)}},"fields":$fields,"data":$data}"""
    }
    val lists = out.lists.map(listJson).mkString("[", ",", "]")
    val pag = out.pagination
      .map(p => s"""{"next":${jsonStr(p.selector)},"next_url":${jsonStr(p.nextUrl)}}""")
      .getOrElse("null")
    s"""{"url":${jsonStr(out.url)},"plain_list":$lists,"pagination":$pag}"""
  }
}
