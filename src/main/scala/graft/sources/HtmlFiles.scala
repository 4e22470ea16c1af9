package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.detect.Page

/** Local HTML file source (S4 in SURVEY.md §2.1): the reference detects
  * pages supplied as files/strings (webspot CLI `-f page.html`); here a
  * directory of .html files becomes a pages table via Spark's binaryFile
  * source — content arrives as the same `html: binary` column the rest of
  * the engine consumes, and the encoding sniff (S3) happens downstream in
  * HtmlParser.decodeBytes exactly as for crawled bytes.
  */
object HtmlFiles {

  /** Read html files under `path` (glob ok) as Page rows: url = file:// URI,
    * warc_ts = file modification time.
    */
  def read(spark: SparkSession, path: String, glob: String = "*.html"): Dataset[Page] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("modificationTime"), col("content"))
      .as[(String, java.sql.Timestamp, Array[Byte])]
      .map { case (p, ts, bytes) => Page(p, ts, bytes, null, null) }
  }
}
