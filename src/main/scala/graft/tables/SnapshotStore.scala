package graft.tables

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style snapshot layer (SURVEY.md §7.3) — no Iceberg runtime jar on
  * the offline classpath, so we emulate the commit protocol: each table is a
  * directory of immutable parquet data dirs plus `snapshots/v{N}.json`
  * manifests committed by atomic rename. Readers resolve the latest manifest;
  * a crash between data write and manifest rename leaves the previous
  * snapshot intact (snapshot isolation, crash-resume — north rule C8).
  *
  * The API is a seam: `iceberg-spark-runtime` drops in behind
  * read/commit/latestVersion when available.
  */
object SnapshotStore {

  final case class Manifest(version: Int, dataDirs: Map[String, String],
      counters: Map[String, Long])

  private def snapshotsDir(tableDir: String) = Paths.get(tableDir, "snapshots")

  def latestVersion(tableDir: String): Option[Int] = {
    val dir = snapshotsDir(tableDir)
    if (!Files.isDirectory(dir)) return None
    val versions = Files.list(dir).iterator()
    var best = -1
    versions.forEachRemaining { p =>
      val name = p.getFileName.toString
      if (name.startsWith("v") && name.endsWith(".json")) {
        try { best = math.max(best, name.stripPrefix("v").stripSuffix(".json").toInt) }
        catch { case _: NumberFormatException => }
      }
    }
    if (best < 0) None else Some(best)
  }

  // hand-rolled minimal json (flat string/long maps only) — no json lib needed
  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  def writeManifest(tableDir: String, m: Manifest): Unit = {
    val dir = snapshotsDir(tableDir)
    Files.createDirectories(dir)
    val data = m.dataDirs.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
    val ctrs = m.counters.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString(",")
    val json = s"""{"version":${m.version},"dataDirs":{$data},"counters":{$ctrs}}"""
    val tmp = dir.resolve(s".v${m.version}.json.tmp")
    Files.writeString(tmp, json)
    // atomic commit: rename tmp -> vN.json
    Files.move(tmp, dir.resolve(s"v${m.version}.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  def readManifest(tableDir: String, version: Int): Manifest = {
    val json = Files.readString(snapshotsDir(tableDir).resolve(s"v$version.json"))
    // minimal parser for the flat shape we write
    def section(name: String): Map[String, String] = {
      val i = json.indexOf(s""""$name":{""")
      if (i < 0) return Map.empty
      val start = json.indexOf('{', i) + 1
      val end = json.indexOf('}', start)
      val body = json.substring(start, end).trim
      if (body.isEmpty) Map.empty
      else body.split(",").iterator.map { kv =>
        val c = kv.indexOf(':')
        val k = kv.take(c).trim.stripPrefix("\"").stripSuffix("\"")
        val v = kv.drop(c + 1).trim.stripPrefix("\"").stripSuffix("\"")
        k -> v
      }.toMap
    }
    val ver = {
      val i = json.indexOf("\"version\":") + 10
      json.substring(i, json.indexWhere(c => !c.isDigit, i)).toInt
    }
    Manifest(ver, section("dataDirs"), section("counters").map { case (k, v) => k -> v.toLong })
  }

  def latestManifest(tableDir: String): Option[Manifest] =
    latestVersion(tableDir).map(readManifest(tableDir, _))

  /** Write the dataframes for one snapshot and commit the manifest
    * atomically. Each logical table gets `data/v{N}/{name}`. The per-table
    * writes are independent jobs — launched concurrently so the Spark
    * scheduler overlaps them (matters for per-round wall time).
    *
    * `tables` are full rewrites. `deltas` are append-only tables: only the
    * new rows are written; the manifest records previousDirs + deltaDir
    * (';'-joined), so a snapshot never rewrites the accumulated history —
    * at 10^10-url scale the seen set and lineage MUST be append-only.
    */
  /** `partitionCols`: tables/deltas written with a hive-style partition
    * layout (e.g. the seen table partitioned by `bucket`, so a cuckoo
    * rebuild's `bucket IN (...)` predicate prunes at file listing and reads
    * only the overfull buckets' files — round-3 verdict #2). The write
    * repartitions by the partition columns first so each delta lands as one
    * file per partition value instead of nTasks x nValues fragments.
    */
  def commit(tableDir: String, version: Int, tables: Map[String, DataFrame],
      counters: Map[String, Long],
      deltas: Map[String, (DataFrame, Seq[String])] = Map.empty,
      carry: Map[String, Seq[String]] = Map.empty,
      partitionCols: Map[String, Seq[String]] = Map.empty,
      preWritten: Map[String, (String, Seq[String])] = Map.empty): Manifest = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    import org.apache.spark.sql.functions.col
    def write(name: String, df: DataFrame, dir: String): Unit =
      partitionCols.get(name) match {
        case Some(cols) =>
          df.repartition(cols.map(col): _*).write.mode("overwrite")
            .partitionBy(cols: _*).parquet(dir)
        case None => df.write.mode("overwrite").parquet(dir)
      }
    val writes = tables.toSeq.map { case (name, df) =>
      val dir = Paths.get(tableDir, "data", s"v$version", name).toString
      Future { write(name, df, dir); name -> dir }
    } ++ deltas.toSeq.map { case (name, (df, prevDirs)) =>
      val dir = Paths.get(tableDir, "data", s"v$version", name).toString
      Future {
        write(name, df, dir)
        name -> (prevDirs :+ dir).mkString(";")
      }
    }
    // `carry`: tables untouched this commit — record their existing dirs in
    // the new manifest without writing anything. `preWritten`: delta dirs the
    // caller already wrote for this version (e.g. the seen delta, whose write
    // job doubles as the round's probe-chain materialization + new-url count)
    // — recorded like a delta, no second write.
    val dataDirs = Await.result(Future.sequence(writes), Duration.Inf).toMap ++
      carry.map { case (name, dirs) => name -> dirs.mkString(";") } ++
      preWritten.map { case (name, (dir, prevDirs)) =>
        name -> (prevDirs :+ dir).mkString(";") }
    val m = Manifest(version, dataDirs, counters)
    writeManifest(tableDir, m)
    m
  }

  def dirsOf(m: Manifest, name: String): Seq[String] =
    m.dataDirs(name).split(";").toSeq

  /** The delta dir `commit(version)` would write for `name` — for callers
    * that pre-write a delta (see `preWritten`).
    */
  def deltaDirFor(tableDir: String, version: Int, name: String): String =
    Paths.get(tableDir, "data", s"v$version", name).toString

  def read(spark: SparkSession, m: Manifest, name: String): DataFrame =
    spark.read.parquet(dirsOf(m, name): _*)

  /** Read with a CALLER-PINNED schema: skips the driver-side footer read
    * that schema inference costs on every open — the engine re-opens its
    * state tables every round, so these add up at high round rates.
    */
  def read(spark: SparkSession, m: Manifest, name: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).parquet(dirsOf(m, name): _*)
}
