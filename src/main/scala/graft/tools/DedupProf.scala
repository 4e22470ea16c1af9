package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level decomposition of the d5/d6 minhash cost at sf0.1 — the
  * shingle volume is tiny (~260k rows), so the wall time must come from a
  * structural term, not data volume. Times each sub-plan separately.
  */
object DedupProf {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def tokens(c: org.apache.spark.sql.Column) = split(trim(lower(c)), "\\s+")
    def sh(ts: org.apache.spark.sql.Column) = transform(
      slice(ts, lit(1), greatest(size(ts) - 2, lit(0))),
      (x, i) => concat_ws(" ", x, element_at(ts, i + 2), element_at(ts, i + 3)))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    time("scan only")(docs.count())
    time("tokens")(docs.select(tokens(col("text")).as("ts")).count())
    time("shingle array")(docs.select(sh(tokens(col("text"))).as("s")).count())
    time("shingle array (x2)")(docs.select(sh(tokens(col("text"))).as("s")).count())
    time("+array_distinct")(docs.select(array_distinct(sh(tokens(col("text")))).as("s")).count())
    time("+explode")(docs.select(col("doc_id"), explode(sh(tokens(col("text")))).as("sh")).count())
    time("+1 md5 agg")(docs.select(col("doc_id"), explode(sh(tokens(col("text")))).as("sh"))
      .groupBy(col("doc_id")).agg(min(md5(concat(lit("0:"), col("sh")))).as("s0")).count())
    time("bound ts +explode")(docs.select(col("doc_id"), tokens(col("text")).as("ts"))
      .select(col("doc_id"), explode(sh(col("ts"))).as("sh")).count())
    time("bound ts +4 md5 agg")(docs.select(col("doc_id"), tokens(col("text")).as("ts"))
      .select(col("doc_id"), explode(sh(col("ts"))).as("sh"))
      .groupBy(col("doc_id")).agg(
        min(md5(concat(lit("0:"), col("sh")))).as("s0"),
        min(md5(concat(lit("1:"), col("sh")))).as("s1"),
        min(md5(concat(lit("2:"), col("sh")))).as("s2"),
        min(md5(concat(lit("3:"), col("sh")))).as("s3")).count())
    time("+4 md5 agg (=d5)")(docs.select(col("doc_id"), explode(sh(tokens(col("text")))).as("sh"))
      .groupBy(col("doc_id")).agg(
        min(md5(concat(lit("0:"), col("sh")))).as("s0"),
        min(md5(concat(lit("1:"), col("sh")))).as("s1"),
        min(md5(concat(lit("2:"), col("sh")))).as("s2"),
        min(md5(concat(lit("3:"), col("sh")))).as("s3")).count())
    spark.stop()
  }
}
