package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.SyntheticWeb
import graft.detect.Detector

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` entries with a key in `oracleSql` are checked value-for-value
  * against DuckDB on the same parquet tables; entries without an oracle get a
  * rows-only check (non-SQL-expressible operators: detection, crawl, cuckoo).
  */
object SparkEntry {

  /** Flagship: unsupervised list detection + extraction over a synthetic
    * Common-Crawl-style pages table (the reference's core capability,
    * plain_list.py) as ONE narrow map — no shuffle until the final explode.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pages = SyntheticWeb.pagesFast(spark, nPages = 64, nHosts = 4, nPartitions = 8)
    Detector.detect(pages)
      .flatMap(o => o.lists.map(l =>
        (o.url, l.name, l.listSelector, l.score, l.data.size)))
      .toDF("url", "name", "list_selector", "score", "n_rows")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
