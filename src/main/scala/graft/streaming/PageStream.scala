package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.detect.{Detector, Page}

/** Streaming extraction (§2.10): the fused detect map over a PAGE firehose —
  * `readStream` on the pages table directory, the same narrow per-row map
  * the batch path uses (stateless, so Append mode needs no watermark), sink
  * of per-page detection counters. A production deployment points this at
  * the fetcher's landing directory and gets continuous extraction with
  * exactly-once file-source semantics.
  */
object PageStream {

  def readPages(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Per-page detection counters as a streaming map. */
  def detectCounts(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.as[Page].map { p =>
      val out = Detector.detectHtml(p.url, p.html)
      (p.url, out.nNodes, out.lists.size,
        out.lists.map(_.data.size).sum,
        out.pagination.map(_.nextUrl).orNull)
    }.toDF("url", "n_nodes", "n_lists", "n_rows", "next_url")
  }
}
